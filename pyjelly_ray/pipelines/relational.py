"""Relational + training-data queries over the driver's parquet tables.

Every public ``q_*`` function takes ``sf_dir`` and returns a Dataset /
pyarrow Table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL with IDENTICAL
output column names (the driver compares by name + value hash).

Ray Data idioms used throughout (SURVEY.md §2.5):
- column-pruned ``read_parquet``
- partial-aggregate combiner (``stages.agg.grouped_agg``) before every
  group-by — shuffle volume is |groups|, not |rows|
- broadcast joins for small sides (``stages.joins``), ``Dataset.join`` hash
  shuffle only for big⋈big (lineitem ⋈ orders)
- per-batch local top-k before global sort+limit

Float determinism: money sums round to 2, ratios to 6, cosine sims to 4 —
both here and in the SQL; embeddings cast to DOUBLE in SQL to match numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.agg import grouped_agg, global_topk
from ..stages.joins import broadcast_join, broadcast_semi, hash_join
from ..stages.text import LanguageID, quality_scores, token_stats


def _read(sf_dir: str, table: str, columns=None, num_blocks: int | None = None):
    import ray

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


def _add_g(b: pa.Table) -> pa.Table:
    """Append the constant ``__g`` key used to route a tiny table into a
    single-partition finalize (``grouped_map(..., "__g", fn)``) — the
    shared helper behind every scalar-statistic query."""
    return b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8)))


# --------------------------------------------------------------------------
# TPC-H-flavoured relational pipelines
# --------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """Filter → derived column → 6-group aggregate (classic Q1 shape)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), cutoff))
        disc_price = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        )
        return b.append_column("disc_price", disc_price)

    ds = li.map_batches(prep, batch_format="pyarrow")
    return grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "l_quantity", "sum"),
            ("sum_base_price", "l_extendedprice", "sum"),
            ("sum_disc_price", "disc_price", "sum"),
            ("avg_qty", "l_quantity", "mean"),
            ("avg_price", "l_extendedprice", "mean"),
            ("avg_disc", "l_discount", "mean"),
            ("count_order", "l_quantity", "count"),
        ],
        round_to=2,
    )


def q3_top_orders(sf_dir: str):
    """BUILDING-segment revenue top-10: semi-filter + hash join + topk."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = broadcast_semi(orders, building, left_key="o_custkey", right_key="c_custkey")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-03-15", "us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_shipdate"), cutoff))
        rev = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        )
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li = li.map_batches(prep, batch_format="pyarrow")

    def agg_part(t: pa.Table) -> pa.Table:
        # join key == group key → every l_orderkey is complete within its
        # partition, so this per-partition aggregate is globally final and
        # the full join output never needs a second exchange
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "revenue": pc.round(g.column("rev_sum"), ndigits=2),
            }
        )

    # big ⋈ big: explicit co-partitioned hash join (scale path), aggregate
    # fused into the join reduce (hash_join(post=...))
    agg = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=agg_part
    )
    return global_topk(agg, ["revenue", "l_orderkey"], 10, descending=[True, False])


def q5_nation_revenue(sf_dir: str):
    """Per-nation customer revenue: 3 broadcast dims + 1 hash join."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, nation, left_key="c_nationkey", right_key="n_nationkey", columns=["n_name"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, left_key="o_custkey", right_key="c_custkey", columns=["n_name"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        )
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li = li.map_batches(prep, batch_format="pyarrow")

    def partial_by_nation(t: pa.Table) -> pa.Table:
        # sum is associative → a per-partition PARTIAL by the (different)
        # final group key shrinks the second exchange to ~n_nations rows
        # per partition and keeps the full join output off the object store
        g = t.group_by("n_name").aggregate([("rev", "sum")])
        return pa.table({"n_name": g.column("n_name"), "rev": g.column("rev_sum")})

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey",
        post=partial_by_nation,
    )
    return grouped_agg(joined, ["n_name"], [("revenue", "rev", "sum")], round_to=2)


def q_top_parts(sf_dir: str):
    """Group-by part, broadcast part names, global top-10 by quantity."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    agg = grouped_agg(li, ["l_partkey"], [("sum_qty", "l_quantity", "sum")], round_to=2)
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    joined = broadcast_join(agg, part, left_key="l_partkey", right_key="p_partkey", columns=["p_name"])
    return global_topk(joined, ["sum_qty", "l_partkey"], 10, descending=[True, False])


def q_mktsegment_stats(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, left_key="o_custkey", right_key="c_custkey", columns=["c_mktsegment"])
    return grouped_agg(
        joined,
        ["c_mktsegment"],
        [
            ("n_orders", "o_totalprice", "count"),
            ("sum_totalprice", "o_totalprice", "sum"),
            ("avg_totalprice", "o_totalprice", "mean"),
        ],
        round_to=2,
    )


def q_supplier_region_stats(sf_dir: str):
    """Supplier balances per region: two chained broadcast dims + min/max
    agg.  The mean is computed from an EXACT integer-cents sum (divided
    once at the end): a float mean of 2-decimal money can land exactly on
    a .xx5 rounding boundary (sf0.1 AMERICA does: 846035.10/180 =
    4700.195), where summation order decides the last cent — integer
    cents make it order-independent on both the Ray and SQL sides."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    supp = broadcast_join(supp, nation, left_key="s_nationkey", right_key="n_nationkey", columns=["n_regionkey"])
    supp = broadcast_join(supp, region, left_key="n_regionkey", right_key="r_regionkey", columns=["r_name"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(
            b.column("s_acctbal"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return b.append_column("__cents", c)

    agg = grouped_agg(
        supp.map_batches(cents, batch_format="pyarrow"),
        ["r_name"],
        [
            ("n_suppliers", "s_acctbal", "count"),
            ("min_acctbal", "s_acctbal", "min"),
            ("max_acctbal", "s_acctbal", "max"),
            ("cents_sum", "__cents", "sum"),
        ],
        round_to=2,
        sum_as_float=False,
    )

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        n = pc.cast(b.column("n_suppliers"), pa.float64())
        avg = pc.divide(
            pc.divide(pc.cast(b.column("cents_sum"), pa.float64()),
                      pa.scalar(100.0, pa.float64())), n)
        return pa.table({
            "r_name": b.column("r_name"),
            "n_suppliers": pc.cast(b.column("n_suppliers"), pa.int64()),
            "min_acctbal": b.column("min_acctbal"),
            "max_acctbal": b.column("max_acctbal"),
            "avg_acctbal": round_like_duckdb(avg, 2),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_high_value_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    filtered = orders.map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 400000.0)),
        batch_format="pyarrow",
    )
    return global_topk(filtered, ["o_totalprice", "o_orderkey"], 100, descending=[True, False])


def q_order_status(sf_dir: str):
    """count + count-distinct per status (two-phase distinct)."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_custkey"])
    counts = grouped_agg(orders, ["o_orderstatus"], [("n_orders", "o_custkey", "count")])
    distinct_pairs = grouped_agg(
        orders, ["o_orderstatus", "o_custkey"], [("one", "o_custkey", "count")]
    )
    ncust = grouped_agg(distinct_pairs, ["o_orderstatus"], [("n_customers", "one", "count")])
    left = _to_table(counts).select(["o_orderstatus", "n_orders"])
    right = _to_table(ncust).select(["o_orderstatus", "n_customers"])
    return left.join(right, keys=["o_orderstatus"])


def q_events_value_spread(sf_dir: str):
    """Per-type value dispersion: mergeable-moment var/std (Σx, Σx², n
    partials combined per batch — the 100 TB path for second moments)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_agg(
        ev,
        ["event_type"],
        [
            ("n_events", "value", "count"),
            ("var_value", "value", "var"),
            ("std_value", "value", "std"),
        ],
        round_to=6,
    )


def q_lineitem_qty_price_corr(sf_dir: str):
    """Per-returnflag Pearson corr(quantity, extendedprice) from mergeable
    moments (Σx, Σy, Σx², Σy², Σxy partials → one tiny exchange)."""
    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    return grouped_agg(
        li,
        ["l_returnflag"],
        [
            ("n_items", "l_quantity", "count"),
            ("qty_price_corr", ("l_quantity", "l_extendedprice"), "corr"),
            ("qty_price_covar", ("l_quantity", "l_extendedprice"), "covar"),
        ],
        round_to=6,
    )


def q_events_by_type(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type", "value", "user_id"])
    base = grouped_agg(
        ev,
        ["event_type"],
        [
            ("n_events", "value", "count"),
            ("sum_value", "value", "sum"),
            ("avg_value", "value", "mean"),
        ],
        round_to=2,
    )
    pairs = grouped_agg(ev, ["event_type", "user_id"], [("one", "value", "count")])
    nuser = grouped_agg(pairs, ["event_type"], [("n_users", "one", "count")])
    return _to_table(base).join(_to_table(nuser).select(["event_type", "n_users"]), keys=["event_type"])


def q_events_daily_ma7(sf_dir: str):
    """Sliding window: per-type daily sums + 7-day trailing moving average.

    Aggregate FIRST (daily sums via combiner groupby), window SECOND over the
    tiny per-type series — the scale-safe order for windowed aggregates.
    """
    from ..stages.window import rolling_mean

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def day(b: pa.Table) -> pa.Table:
        key = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        return pa.table(
            {"event_type": b.column("event_type"), "day": key, "value": b.column("value")}
        )

    daily = grouped_agg(
        ev.map_batches(day, batch_format="pyarrow"),
        ["event_type", "day"],
        [("sum_value", "value", "sum")],
        round_to=2,
    )
    return rolling_mean(
        daily, key="event_type", order_col="day", value_col="sum_value",
        window=7, out_name="ma7", round_to=6,
    )


def q_order_price_quantiles(sf_dir: str):
    """Exact per-status p50/p90 of order totals (= DuckDB quantile_cont)."""
    from ..stages.agg import grouped_quantiles

    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    return grouped_quantiles(
        orders, ["o_orderstatus"], "o_totalprice",
        [("p50_totalprice", 0.5), ("p90_totalprice", 0.9)], round_to=2,
    )


def q_top_words(sf_dir: str):
    """Global word frequency top-20 (all occurrences, vectorized explode)."""
    docs = _read(sf_dir, "documents", ["text"])

    def words(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(b.column("text"), pattern=" "))
        return pa.table({"word": flat})

    exploded = docs.map_batches(words, batch_format="pyarrow")
    counts = grouped_agg(exploded, ["word"], [("n", "word", "count")])
    return global_topk(counts, ["n", "word"], 20, descending=[True, False])


def q_customer_running_spend(sf_dir: str):
    """Running totals per customer (SQL window functions, one exchange):
    cumulative spend, running max order, order sequence number and the
    previous order's price — all from one ``grouped_running`` pass."""
    from ..stages.window import grouped_running

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )
    return grouped_running(
        orders,
        key="o_custkey",
        order_col="o_orderdate",
        value_col="o_totalprice",
        kinds=[
            ("cum_spend", "cumsum"),
            ("max_order", "cummax"),
            ("order_seq", "row_number"),
            ("prev_price", "lag"),
        ],
        round_to=2,
        tiebreak="o_orderkey",
    )


def q_order_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority) in one data pass: the finest
    partial is combined per batch, coarser grouping sets derive from it
    map-side, and a single exchange merges all three levels."""
    from ..stages.agg import grouped_agg_sets

    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return grouped_agg_sets(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            ("n_orders", "o_totalprice", "count"),
            ("sum_price", "o_totalprice", "sum"),
            ("avg_price", "o_totalprice", "mean"),
        ],
        round_to=2,
    )


def q_lineitem_qty_ranks(sf_dir: str):
    """SQL rank family over heavy ties: rank/dense_rank/percent_rank/
    cume_dist of quantity within each returnflag, one exchange (peer groups
    = equal quantities, so no tiebreak is needed for determinism)."""
    from ..stages.window import grouped_running

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    )
    return grouped_running(
        li,
        key="l_returnflag",
        order_col="l_quantity",
        value_col="l_quantity",
        kinds=[
            ("qty_rank", "rank"),
            ("qty_dense_rank", "dense_rank"),
            ("qty_pct_rank", "percent_rank"),
            ("qty_cume_dist", "cume_dist"),
        ],
        round_to=6,
    )


def q_click_days_no_purchase(sf_dir: str):
    """EXCEPT DISTINCT on a composite row identity: (user, day) pairs with
    a click but no purchase (big−big, per-batch distinct combiner + one
    full-row hash exchange)."""
    from ..stages.setops import set_op

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def pairs_of(t):
        def f(b: pa.Table, t=t) -> pa.Table:
            b = b.filter(pc.equal(b.column("event_type"), t))
            return pa.table(
                {
                    "user_id": b.column("user_id"),
                    "day": pc.strftime(b.column("ts"), format="%Y-%m-%d"),
                }
            )

        return ev.map_batches(f, batch_format="pyarrow")

    return set_op(pairs_of("click"), pairs_of("purchase"), "except",
                  columns=["user_id", "day"])


def q_click_purchase_users(sf_dir: str):
    """INTERSECT DISTINCT: users who both clicked and purchased."""
    from ..stages.setops import set_op

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def of_type(t):
        return ev.map_batches(
            lambda b, t=t: b.filter(pc.equal(b.column("event_type"), t)).select(
                ["user_id"]
            ),
            batch_format="pyarrow",
        )

    return set_op(of_type("click"), of_type("purchase"), "intersect",
                  columns=["user_id"])


def q_click_purchase_value(sf_dir: str):
    """FULL OUTER big⋈big hash join of two per-user aggregates (clicks vs
    purchases) — co-partitioned exchange, Arrow full-outer per partition,
    keys coalesced."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def side(t, n_name, v_name):
        f = ev.map_batches(
            lambda b, t=t: b.filter(pc.equal(b.column("event_type"), t)),
            batch_format="pyarrow",
        )
        return grouped_agg(
            f, ["user_id"],
            [(n_name, "value", "count"), (v_name, "value", "sum")],
            round_to=2,
        )

    clicks = side("click", "n_clicks", "click_value")
    purchases = side("purchase", "n_purchases", "purchase_value")
    return hash_join(
        clicks, purchases, left_key="user_id", how="full outer", num_partitions=8
    )


def q_top_type_per_user(sf_dir: str):
    """Per-group mode: each user's most frequent event type (count combiner
    → grouped top-1 with deterministic tiebreak)."""
    from ..stages.agg import grouped_topk

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = grouped_agg(
        ev, ["user_id", "event_type"], [("n", "event_type", "count")]
    )
    return grouped_topk(
        counts, "user_id", "n", 1, descending=True, tiebreak=["event_type"]
    )


def q_customer_order_window(sf_dir: str):
    """lead / first_value / ntile window functions per customer order
    history — same one-exchange kernel as q_customer_running_spend."""
    from ..stages.window import grouped_running

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )
    return grouped_running(
        orders,
        key="o_custkey",
        order_col="o_orderdate",
        value_col="o_totalprice",
        kinds=[
            ("next_price", "lead"),
            ("first_price", "first_value"),
            ("spend_quartile", ("ntile", 4)),
            ("second_price", ("nth_value", 2)),
        ],
        round_to=2,
        tiebreak="o_orderkey",
    )


def q_lineitem_cube(sf_dir: str):
    """GROUP BY CUBE(returnflag, linestatus): all four grouping sets from
    one pass via explicit ``sets`` on grouped_agg_sets."""
    from ..stages.agg import grouped_agg_sets

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return grouped_agg_sets(
        li,
        ["l_returnflag", "l_linestatus"],
        [("n_items", "l_quantity", "count"), ("sum_qty", "l_quantity", "sum")],
        sets=[
            ["l_returnflag", "l_linestatus"],
            ["l_returnflag"],
            ["l_linestatus"],
            [],
        ],
        round_to=2,
    )


def _q_customer_highvalue(sf_dir: str, how: str):
    """Big⋈big SEMI / ANTI equi-join through the co-partitioned hash join
    (EXISTS / NOT EXISTS shape — no broadcast, no bloom; both sides
    exchange once and pyarrow's semi/anti kernel runs per partition)."""
    from ..stages.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def high_value(t):
        import pyarrow.compute as _pc

        return t.filter(_pc.greater(t.column("o_totalprice"), 400000.0)).select(
            ["o_custkey"]
        )

    hv = orders.map_batches(high_value, batch_format="pyarrow")
    return hash_join(cust, hv, left_key="c_custkey", right_key="o_custkey", how=how)


def q_customers_high_value_semi(sf_dir: str):
    """Customers with ≥1 order over 400k — big⋈big LEFT SEMI hash join."""
    return _q_customer_highvalue(sf_dir, "left semi")


def q_customers_no_high_value(sf_dir: str):
    """Customers with NO order over 400k — big⋈big LEFT ANTI hash join."""
    return _q_customer_highvalue(sf_dir, "left anti")


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour event-time window × event_type — the streaming
    windowed-aggregate shape (epoch-truncate map + one grouped_agg)."""
    from ..stages.window import windowed_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return windowed_agg(
        ev,
        ts_col="ts",
        width_s=3600,
        keys="event_type",
        specs=[("n_events", "value", "count"), ("sum_value", "value", "sum")],
        round_to=2,
    )


def q_events_hopping(sf_dir: str):
    """Hopping window (width 1 h, hop 15 min): each event lands in 4
    overlapping windows via a map-side vectorized explode; the exchange
    still carries only per-window partials."""
    from ..stages.window import windowed_agg

    ev = _read(sf_dir, "events", ["ts", "value"])
    return windowed_agg(
        ev,
        ts_col="ts",
        width_s=3600,
        hop_s=900,
        specs=[("n_events", "value", "count"), ("sum_value", "value", "sum")],
        round_to=2,
    )


def q_user_event_pivot(sf_dir: str):
    """PIVOT events FOR event_type IN (...) — per-user spend by event
    type as the agg-FILTER rewrite (conditional columns + one exchange)."""
    from ..stages.pivot import pivot_agg

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    return pivot_agg(
        ev,
        "user_id",
        pivot_col="event_type",
        values=["click", "error", "purchase", "signup", "view"],
        value_col="value",
        agg="sum",
        name_fmt="sum_{}",
        round_to=2,
    )


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT lineitem's four measures into (measure, amount) rows —
    stateless stacking map, zero shuffle."""
    from ..stages.pivot import unpivot

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + cols)
    return unpivot(
        li,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=cols,
        var_name="measure",
        value_name="amount",
    )


def q_top_words_approx(sf_dir: str):
    """Heavy-hitters-sketch variant of ``q_top_words`` (rows-only check —
    bounded per-block state; accuracy unit-tested vs exact counts within
    the n/(per_block+1) Misra-Gries bound in ``tests/test_sketch.py``)."""
    from ..stages.sketch import approx_heavy_hitters

    docs = _read(sf_dir, "documents", ["text"])

    def words(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(b.column("text"), pattern=" "))
        return pa.table({"word": flat})

    exploded = docs.map_batches(words, batch_format="pyarrow")
    return approx_heavy_hitters(exploded, "word", k=20)


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER broadcast join: order count per customer incl. zeros."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = grouped_agg(orders, ["o_custkey"], [("n_raw", "o_custkey", "count")])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = broadcast_join(
        cust, counts, left_key="c_custkey", right_key="o_custkey",
        how="left outer", columns=["n_raw"],
    )

    def fill(b: pa.Table) -> pa.Table:
        n = pc.coalesce(b.column("n_raw"), pa.scalar(0, pa.int64()))
        return pa.table({"c_custkey": b.column("c_custkey"), "n_orders": n})

    return joined.map_batches(fill, batch_format="pyarrow")


def q_event_bursts(sf_dir: str):
    """Range (interval) self-join: per event, same-user events in the next hour.

    The window bounds are computed map-side, then ONE groupby shuffle does
    the per-key band match (``interval_join_agg``); output is |events| rows
    with exact integer counts — the scale-safe shape for interval joins
    feeding aggregates (no pair materialization).
    """
    from ..stages.joins import interval_join_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def win(b: pa.Table) -> pa.Table:
        start = pc.cast(b.column("ts"), pa.int64())
        end = pc.add(start, pa.scalar(3_600 * 1_000_000, pa.int64()))
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "w_start": start,
                "w_end": end,
            }
        )

    return interval_join_agg(
        ev.map_batches(win, batch_format="pyarrow"),
        _read(sf_dir, "events", ["user_id", "ts"]),
        left_key="user_id",
        right_key="user_id",
        start_col="w_start",
        end_col="w_end",
        right_ts="ts",
        count_name="n_next_hour",
        left_cols={"event_id": pa.int64()},
    )


#: canonical train/val/test fractions used by the split query and its oracle
_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def q_doc_splits(sf_dir: str):
    """Deterministic train/val/test split sizes per language (no shuffle)."""
    from ..stages.sample import deterministic_split

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    tagged = deterministic_split(docs, id_col="doc_id", splits=_SPLITS, seed="r1")
    return grouped_agg(tagged, ["lang", "split"], [("n_docs", "doc_id", "count")])


def q_events_user_distinct_approx(sf_dir: str):
    """Approx distinct users per event type (mergeable HLL; rows-only check —
    sketch estimates have no SQL-exact oracle; accuracy is unit-tested
    against exact COUNT DISTINCT within HLL error bounds)."""
    from ..stages.sketch import grouped_approx_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_approx_distinct(ev, ["event_type"], "user_id",
                                   out_name="approx_users")


def q_events_value_quantiles_approx(sf_dir: str):
    """Approx per-type value quantiles (mergeable t-digest; rows-only)."""
    from ..stages.sketch import grouped_approx_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_approx_quantiles(
        ev, ["event_type"], "value", [("p50_value", 0.5), ("p90_value", 0.9)]
    )


def q_customers_no_urgent(sf_dir: str):
    """Broadcast ANTI join: customers with no 1-URGENT order (filter pushed
    to the read, key set broadcast once)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT")),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return broadcast_semi(cust, urgent, left_key="c_custkey",
                          right_key="o_custkey", anti=True)


def q_top_orders_per_status(sf_dir: str):
    """Per-group top-k: 3 highest-value orders per status (row_number ≤ 3)."""
    from ..stages.agg import grouped_topk

    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderkey", "o_totalprice"])
    top = grouped_topk(
        orders, ["o_orderstatus"], "o_totalprice", 3,
        descending=True, tiebreak=["o_orderkey"],
    )
    return top.select_columns(["o_orderstatus", "o_orderkey", "o_totalprice"])


def q_user_sessions(sf_dir: str):
    """Session windows: 30-min gap sessionization + per-session aggregates."""
    from ..stages.window import session_stats

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return session_stats(ev, gap_minutes=30.0)


def q_events_asof_order(sf_dir: str):
    """As-of join: each event matched to the user's latest order at or
    before the event time (backward as-of, left semantics) — checked
    against DuckDB's native ASOF LEFT JOIN."""
    from ..stages.joins import asof_join_backward

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    return asof_join_backward(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value="o_orderkey",
        out_value="last_orderkey",
        left_cols={
            "event_id": pa.int64(),
            "user_id": pa.int64(),
            "ts": pa.timestamp("us"),
        },
    )


def q_nation_customers(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j1 = broadcast_join(cust, nation, left_key="c_nationkey", right_key="n_nationkey", columns=["n_name", "n_regionkey"])
    j2 = broadcast_join(j1, region, left_key="n_regionkey", right_key="r_regionkey", columns=["r_name"])
    return grouped_agg(j2, ["r_name", "n_name"], [("n_customers", "c_custkey", "count")])


def q_part_type_stats(sf_dir: str):
    part = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    return grouped_agg(
        part,
        ["p_type"],
        [
            ("n_parts", "p_retailprice", "count"),
            ("avg_retail", "p_retailprice", "mean"),
            ("max_retail", "p_retailprice", "max"),
        ],
        round_to=2,
    )


# --------------------------------------------------------------------------
# documents / text analysis
# --------------------------------------------------------------------------


def q_doc_token_stats(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    stats = docs.map_batches(token_stats, batch_format="pyarrow")
    return grouped_agg(
        stats,
        ["lang"],
        [
            ("n_docs", "n_tokens", "count"),
            ("sum_tokens", "n_tokens", "sum"),
            ("avg_tokens", "n_tokens", "mean"),
            ("avg_chars", "n_chars", "mean"),
        ],
        round_to=6,
    )


def q_doc_quality(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    scored = docs.map_batches(quality_scores, batch_format="pyarrow")
    return grouped_agg(
        scored,
        ["lang"],
        [
            ("avg_stopword_ratio", "stopword_ratio", "mean"),
            ("avg_token_len", "mean_token_len", "mean"),
            ("n_docs", "stopword_ratio", "count"),
        ],
        round_to=6,
    )


def q_doc_dedup_stats(sf_dir: str):
    """Exact dedup bookkeeping: docs vs distinct texts per lang."""
    import hashlib

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def h(b: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest() for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"), "h": pa.array(hs, pa.string())})

    hashed = docs.map_batches(h, batch_format="pyarrow")
    n_docs = grouped_agg(hashed, ["lang"], [("n_docs", "h", "count")])
    distinct = grouped_agg(hashed, ["lang", "h"], [("one", "h", "count")])
    n_uniq = grouped_agg(distinct, ["lang"], [("n_unique", "one", "count")])
    return _to_table(n_docs).join(_to_table(n_uniq).select(["lang", "n_unique"]), keys=["lang"])


def q_doc_exact_dedup_docs(sf_dir: str):
    """Dedup keep-first: one surviving row per distinct text (min doc_id)."""
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def h(b: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest() for t in b.column("text").to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": b.column("doc_id")})

    hashed = docs.map_batches(h, batch_format="pyarrow")
    agg = grouped_agg(
        hashed, ["h"], [("doc_id", "doc_id", "min"), ("n_copies", "doc_id", "count")]
    )

    def strip(b: pa.Table) -> pa.Table:
        return b.drop_columns(["h"])

    return agg.map_batches(strip, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    """Heuristic language-ID distribution (marker-vocabulary argmax)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pred = docs.map_batches(LanguageID(), batch_format="pyarrow", batch_size=None)
    return grouped_agg(pred, ["pred_lang"], [("n_docs", "doc_id", "count")])


def q_doc_fingerprints(sf_dir: str):
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest() for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"), "fp_sha256": pa.array(hs, pa.string())})

    return docs.map_batches(fp, batch_format="pyarrow")


def q_doc_mentions(sf_dir: str):
    """Extraction fan-out: distinct words (len ≥ 6) per doc."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mentions(b: pa.Table) -> pa.Table:
        out_id, out_word = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            seen = set()
            for w in (t or "").split(" "):
                if len(w) >= 6 and w not in seen:
                    seen.add(w)
                    out_id.append(d)
                    out_word.append(w)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()), "word": pa.array(out_word, pa.string())}
        )

    return docs.map_batches(mentions, batch_format="pyarrow")


def q_kg_jelly_roundtrip(sf_dir: str):
    """documents → mention triples → Jelly bytes → decode → count.

    Full format round-trip inside the query; the count is SQL-checkable.
    """
    from ..jelly import StreamOptions, decode_flat, encode_flat
    from ..stages.extract import ONT

    mentions = q_doc_mentions(sf_dir)

    def to_jelly_and_back(b: pa.Table) -> pa.Table:
        stmts = [
            (
                (1, f"https://codekg.dev/doc/{d}", None, None),
                (1, ONT + "mentions", None, None),
                (3, w, None, None),
            )
            for d, w in zip(b.column("doc_id").to_pylist(), b.column("word").to_pylist())
        ]
        data = b"".join(encode_flat(iter(stmts), StreamOptions()))
        n = sum(1 for _ in decode_flat(data))
        return pa.table({"p_value": pa.array([ONT + "mentions"]), "n": pa.array([n], pa.int64())})

    per_block = mentions.map_batches(to_jelly_and_back, batch_format="pyarrow")
    # oracle counts rows (count(*) → int64), so keep the int sum here
    return grouped_agg(
        per_block, ["p_value"], [("n_statements", "n", "sum")], sum_as_float=False
    )


# --------------------------------------------------------------------------
# embeddings / similarity search
# --------------------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(0)
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_embedding_sim_range(sf_dir: str):
    """Range search: all vectors with cosine ≥ 0.15 vs vec 0 (rounded 4)."""
    from ..stages.ann import cosine_threshold

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    q = _query_vec(sf_dir)
    return cosine_threshold(emb, q, 0.15, round_to=4)


def q_embedding_topk(sf_dir: str):
    from ..stages.ann import cosine_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    return cosine_topk(emb, _query_vec(sf_dir), k=10, round_to=4)


def q_embedding_topk_multi(sf_dir: str):
    """Top-5 neighbours for THREE query vectors in one data pass (broadcast
    query matrix, one matmul per batch, per-query grouped top-k merge)."""
    import pyarrow.parquet as pq

    from ..stages.ann import cosine_topk_multi

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    qids = [0, 1, 2]
    qm = np.asarray(
        [t.column("embedding")[ids.index(i)].as_py() for i in qids], dtype=np.float64
    )
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    return cosine_topk_multi(emb, qm, k=5, query_ids=qids, round_to=4)


def q_embedding_label_stats(sf_dir: str):
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"], num_blocks=8)

    def norms(b: pa.Table) -> pa.Table:
        m = np.asarray(b.column("embedding").to_pylist(), dtype=np.float64)
        n = np.round(np.linalg.norm(m, axis=1), 4)
        return pa.table({"label": b.column("label"), "norm": pa.array(n, pa.float64())})

    ds = emb.map_batches(norms, batch_format="pyarrow")
    return grouped_agg(
        ds, ["label"], [("n_vecs", "norm", "count"), ("avg_norm", "norm", "mean")], round_to=4
    )


def q_embedding_ivf_topk(sf_dir: str):
    from ..stages.ann import ivf_assign, ivf_centroids, ivf_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    cents = ivf_centroids(emb, 16)
    assigned = ivf_assign(emb, cents)
    return ivf_topk(assigned, cents, _query_vec(sf_dir), k=10, nprobe=8, round_to=4)


def q_embedding_dup_pairs(sf_dir: str):
    from ..stages.ann import embedding_dup_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    return embedding_dup_pairs(emb, tau=0.8)


def q_embedding_pairs_exact(sf_dir: str):
    """Exact all-pairs cosine ≥ 0.35 (broadcast matmul; SQL-checkable
    brute-force baseline for the approximate LSH dedup path)."""
    from ..stages.ann import embedding_dup_pairs_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    return embedding_dup_pairs_exact(emb, tau=0.35, round_to=4)


def q_corpus_prep(sf_dir: str):
    """Composed training-corpus prep: quality filter → exact dedup
    (keep-first per text) → deterministic split → per-(lang, split) stats.

    One streaming plan chaining the engine's stages: vectorized scoring
    (`add_tokens`/`quality_scores`) and filtering in `map_batches`, exact
    dedup on the hash exchange (`grouped_map`, keyed on text here; swap the
    key to the 128-bit content hash of `stages/dedup.py` at corpus scale so
    the shuffle ships 16 bytes instead of documents), the shuffle-free
    split tagger, and a partial-combine `grouped_agg` — fully SQL-checkable.
    """
    from ..stages.agg import grouped_map
    from ..stages.sample import deterministic_split
    from ..stages.text import add_tokens, quality_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score_filter(b: pa.Table) -> pa.Table:
        sr = quality_scores(b).column("stopword_ratio")
        b = add_tokens(b)
        keep = pc.and_(
            pc.greater_equal(b.column("n_tokens"), pa.scalar(20, pa.int64())),
            pc.less_equal(sr, pa.scalar(0.08, pa.float64())),
        )
        return b.select(["doc_id", "text", "lang", "n_tokens"]).filter(keep)

    def keep_first(t: pa.Table) -> pa.Table:
        """First (min doc_id) row per text run of a key-sorted partition."""
        from ..stages.agg import _key_run_bounds

        out_cols = ["doc_id", "lang", "n_tokens"]
        if t.num_rows == 0:
            return t.select([c for c in out_cols if c in t.column_names])
        t = t.sort_by([("text", "ascending"), ("doc_id", "ascending")])
        bounds = _key_run_bounds(t, ["text"])
        mask = np.zeros(t.num_rows, bool)
        mask[bounds[:-1]] = True
        return t.filter(pa.array(mask)).select(out_cols)

    kept = docs.map_batches(score_filter, batch_format="pyarrow")
    deduped = grouped_map(
        kept,
        "text",
        keep_first,
        per_group=False,
        empty_schema=pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        ),
    )
    tagged = deterministic_split(deduped, id_col="doc_id", splits=_SPLITS, seed="r1")
    return grouped_agg(
        tagged,
        ["lang", "split"],
        [("n_docs", "doc_id", "count"), ("sum_tokens", "n_tokens", "sum")],
    )


def q_minhash_pairs(sf_dir: str):
    from ..stages.sim import minhash_dup_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dup_pairs(docs, threshold=0.5)


def q_simhash_pairs(sf_dir: str):
    from ..stages.sim import simhash_dup_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dup_pairs(docs, max_hamming=8)


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT near-dup pairs: word-3-gram Jaccard >= 0.8 via prefix filtering
    (complete, unlike the probabilistic MinHash/SimHash families) — DuckDB
    all-pairs oracle matches it row for row."""
    from ..stages.sim import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.8, n=3)


def q_minhash_clusters(sf_dir: str):
    """Near-dup clusters: MinHash pairs -> union-find components."""
    from ..stages.sim import dup_clusters, minhash_dup_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_clusters(minhash_dup_pairs(docs, threshold=0.5))


def q_multimodal_features(sf_dir: str):
    """Multimodal plumbing: synth media table → actor-pool decode stub."""
    import ray

    from ..stages.multimodal import ImageDecodeStub, synth_media_table

    media = ray.data.from_arrow(synth_media_table(128))
    feats = media.map_batches(
        ImageDecodeStub, batch_format="pyarrow", batch_size=32, concurrency=2
    )

    def summarize(b: pa.Table) -> pa.Table:
        dims = pc.list_value_length(b.column("features"))
        return pa.table({"media_id": b.column("media_id"), "n_features": pc.cast(dims, pa.int64())})

    return feats.map_batches(summarize, batch_format="pyarrow")


def _to_table(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


# --------------------------------------------------------------------------
# oracle SQL (column names must match the Ray outputs exactly)
# --------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 2) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": """
        SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_nation_revenue": """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "q_top_parts": """
        SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty, p_name
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY l_partkey, p_name
        ORDER BY sum_qty DESC, l_partkey
        LIMIT 10
    """,
    "q_mktsegment_stats": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_totalprice,
               round(avg(o_totalprice), 2) AS avg_totalprice
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    "q_supplier_region_stats": """
        SELECT r_name, count(*) AS n_suppliers,
               round(min(s_acctbal), 2) AS min_acctbal,
               round(max(s_acctbal), 2) AS max_acctbal,
               round(sum(CAST(round(s_acctbal * 100.0) AS BIGINT))
                     / 100.0 / count(*), 2) AS avg_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name
    """,
    "q_high_value_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders WHERE o_totalprice > 400000
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q_order_status": """
        SELECT o_orderstatus, count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus
    """,
    "q_customer_running_spend": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(o_totalprice) OVER w, 2) AS cum_spend,
               round(max(o_totalprice) OVER w, 2) AS max_order,
               row_number() OVER w AS order_seq,
               round(lag(o_totalprice) OVER w, 2) AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    """,
    "q_lineitem_qty_price_corr": """
        SELECT l_returnflag, count(*) AS n_items,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_events_value_spread": """
        SELECT event_type, count(*) AS n_events,
               round(var_samp(value), 6) AS var_value,
               round(stddev_samp(value), 6) AS std_value
        FROM events GROUP BY event_type
    """,
    "q_events_by_type": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(avg(value), 2) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q_events_daily_ma7": """
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, sum_value,
               round(avg(sum_value) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        FROM daily
    """,
    "q_order_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               round(avg(o_totalprice), 2) AS avg_price,
               CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_id
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "q_lineitem_qty_ranks": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               rank() OVER w AS qty_rank,
               dense_rank() OVER w AS qty_dense_rank,
               round(percent_rank() OVER w, 6) AS qty_pct_rank,
               round(cume_dist() OVER w, 6) AS qty_cume_dist
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
    "q_click_days_no_purchase": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, strftime(ts, '%Y-%m-%d')
        FROM events WHERE event_type = 'purchase'
    """,
    "q_click_purchase_users": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "q_click_purchase_value": """
        WITH c AS (
            SELECT user_id, count(*) AS n_clicks,
                   round(sum(value), 2) AS click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id
        ), p AS (
            SELECT user_id, count(*) AS n_purchases,
                   round(sum(value), 2) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        )
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               n_clicks, click_value, n_purchases, purchase_value
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    "q_top_type_per_user": """
        SELECT user_id, event_type, n FROM (
            SELECT user_id, event_type, count(*) AS n,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type
                   ) AS rn
            FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
    """,
    "q_customer_order_window": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(lead(o_totalprice) OVER w, 2) AS next_price,
               round(first_value(o_totalprice) OVER w, 2) AS first_price,
               ntile(4) OVER w AS spend_quartile,
               round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    """,
    "q_lineitem_cube": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS grouping_id
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "q_customers_high_value_semi": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "q_customers_no_high_value": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "q_events_hourly": """
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
               event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_events_hopping": """
        SELECT make_timestamp(k * 900000000) AS w_start,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM (SELECT value,
                     unnest(range(epoch_us(ts) // 900000000 - 3,
                                  epoch_us(ts) // 900000000 + 1)) AS k
              FROM events)
        GROUP BY 1
    """,
    "q_user_event_pivot": """
        SELECT user_id,
               round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS sum_click,
               round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS sum_error,
               round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS sum_purchase,
               round(sum(value) FILTER (WHERE event_type = 'signup'), 2) AS sum_signup,
               round(sum(value) FILTER (WHERE event_type = 'view'), 2) AS sum_view
        FROM events GROUP BY user_id
    """,
    "q_lineitem_unpivot": """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS amount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    "q_order_price_quantiles": """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 2) AS p50_totalprice,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90_totalprice
        FROM orders GROUP BY o_orderstatus
    """,
    "q_top_words": """
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
    """,
    "q_customer_order_counts": """
        SELECT c_custkey, count(o_custkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    "q_event_bursts": """
        SELECT a.event_id, count(b.ts) AS n_next_hour
        FROM events a LEFT JOIN events b
          ON b.user_id = a.user_id
         AND b.ts >= a.ts
         AND b.ts < a.ts + INTERVAL 1 HOUR
        GROUP BY a.event_id
    """,
    "q_customers_no_urgent": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "q_top_orders_per_status": """
        SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    "q_user_sessions": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ), numbered AS (
            SELECT user_id, value,
                   CAST(sum(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM numbered GROUP BY user_id, session_id
    """,
    "q_events_asof_order": """
        WITH r AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
          FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts, r.last_orderkey
        FROM events e ASOF LEFT JOIN r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    "q_nation_customers": """
        SELECT r_name, n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name, n_name
    """,
    "q_part_type_stats": """
        SELECT p_type, count(*) AS n_parts,
               round(avg(p_retailprice), 2) AS avg_retail,
               round(max(p_retailprice), 2) AS max_retail
        FROM part GROUP BY p_type
    """,
    "q_doc_token_stats": """
        SELECT lang, count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS sum_tokens,
               round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
               round(avg(length(text)), 6) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "q_doc_quality": """
        WITH perdoc AS (
            SELECT lang,
                   round(len(list_filter(string_split(text, ' '),
                                         w -> w IN ('the', 'a'))) * 1.0
                         / len(string_split(text, ' ')), 6) AS sr,
                   round(list_aggregate(list_transform(string_split(text, ' '),
                                                       w -> length(w)), 'avg'), 6) AS mtl
            FROM documents)
        SELECT lang, round(avg(sr), 6) AS avg_stopword_ratio,
               round(avg(mtl), 6) AS avg_token_len, count(*) AS n_docs
        FROM perdoc GROUP BY lang
    """,
    "q_doc_dedup_stats": """
        SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_unique
        FROM documents GROUP BY lang
    """,
    "q_doc_exact_dedup_docs": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "q_lang_id": """
        WITH scored AS (
            SELECT doc_id,
                   len(list_filter(string_split(text,' '), w -> w IN ('der','die','und'))) AS s_de,
                   len(list_filter(string_split(text,' '), w -> w IN ('and','of','the'))) AS s_en,
                   len(list_filter(string_split(text,' '), w -> w IN ('de','el','la'))) AS s_es
            FROM documents)
        SELECT pred_lang, count(*) AS n_docs FROM (
            SELECT CASE
                WHEN s_de >= s_en AND s_de >= s_es AND s_de > 0 THEN 'de'
                WHEN s_en >= s_es AND s_en > 0 THEN 'en'
                WHEN s_es > 0 THEN 'es'
                ELSE 'unk' END AS pred_lang
            FROM scored)
        GROUP BY pred_lang
    """,
    "q_doc_fingerprints": """
        SELECT doc_id, sha256(text) AS fp_sha256 FROM documents
    """,
    "q_doc_mentions": """
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
            FROM documents)
        WHERE length(word) >= 6
    """,
    "q_kg_jelly_roundtrip": """
        SELECT 'https://codekg.dev/ont#mentions' AS p_value,
               count(*) AS n_statements
        FROM (
            SELECT doc_id, word FROM (
                SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
                FROM documents)
            WHERE length(word) >= 6)
    """,
    "q_ngram_jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id,
            CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                 ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                     FOR i IN range(1, len(t)-1)])
            END AS gs
          FROM toks
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.gs, b.gs)) AS inter,
                 len(a.gs) AS sa, len(b.gs) AS sb
          FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(CAST(inter AS DOUBLE) / (sa + sb - inter), 6) AS jaccard
        FROM pairs
        WHERE CAST(inter AS DOUBLE) / (sa + sb - inter) >= 0.8
    """,
    "q_embedding_sim_range": """
        SELECT * FROM (
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS sim
            FROM embeddings)
        WHERE sim >= 0.15
    """,
    "q_embedding_topk": """
        SELECT vec_id, sim FROM (
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS sim
            FROM embeddings)
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """,
    "q_embedding_topk_multi": """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id IN (0, 1, 2))
        SELECT query_id, vec_id, sim FROM (
            SELECT q.qid AS query_id, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS sim,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) DESC,
                                e.vec_id) AS rn
            FROM embeddings e CROSS JOIN q)
        WHERE rn <= 5
    """,
    "q_embedding_pairs_exact": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
    """,
    "q_embedding_label_stats": """
        SELECT label, count(*) AS n_vecs,
               round(avg(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                     CAST(embedding AS DOUBLE[]))), 4)), 4) AS avg_norm
        FROM embeddings GROUP BY label
    """,
}


def _doc_splits_sql() -> str:
    from ..stages.sample import sql_split_case

    case = sql_split_case("doc_id", _SPLITS, seed="r1")
    return f"""
        SELECT lang, {case} AS split, count(*) AS n_docs
        FROM documents GROUP BY 1, 2
    """


ORACLE_SQL["q_doc_splits"] = _doc_splits_sql()


def _corpus_prep_sql() -> str:
    from ..stages.sample import sql_split_case

    case = sql_split_case("doc_id", _SPLITS, seed="r1")
    return f"""
        WITH scored AS (
            SELECT doc_id, lang, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(len(list_filter(string_split(text, ' '),
                                         w -> w IN ('the', 'a'))) * 1.0
                         / len(string_split(text, ' ')), 6) AS sr
            FROM documents),
        kept AS (SELECT * FROM scored WHERE n_tokens >= 20 AND sr <= 0.08),
        dedup AS (
            SELECT k.* FROM kept k
            JOIN (SELECT text, min(doc_id) AS m FROM kept GROUP BY text) d
              ON k.doc_id = d.m)
        SELECT lang, {case} AS split,
               count(*) AS n_docs, sum(n_tokens) AS sum_tokens
        FROM dedup GROUP BY 1, 2
    """


ORACLE_SQL["q_corpus_prep"] = _corpus_prep_sql()

#: queries with no SQL equivalent (driver records rows-only check)
QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "q_top_parts": q_top_parts,
    "q_mktsegment_stats": q_mktsegment_stats,
    "q_supplier_region_stats": q_supplier_region_stats,
    "q_high_value_orders": q_high_value_orders,
    "q_order_status": q_order_status,
    "q_events_by_type": q_events_by_type,
    "q_events_value_spread": q_events_value_spread,
    "q_lineitem_qty_price_corr": q_lineitem_qty_price_corr,
    "q_top_words_approx": q_top_words_approx,
    "q_customer_running_spend": q_customer_running_spend,
    "q_order_rollup": q_order_rollup,
    "q_customer_order_window": q_customer_order_window,
    "q_lineitem_cube": q_lineitem_cube,
    "q_customers_high_value_semi": q_customers_high_value_semi,
    "q_customers_no_high_value": q_customers_no_high_value,
    "q_events_hourly": q_events_hourly,
    "q_events_hopping": q_events_hopping,
    "q_user_event_pivot": q_user_event_pivot,
    "q_lineitem_unpivot": q_lineitem_unpivot,
    "q_lineitem_qty_ranks": q_lineitem_qty_ranks,
    "q_click_days_no_purchase": q_click_days_no_purchase,
    "q_click_purchase_users": q_click_purchase_users,
    "q_click_purchase_value": q_click_purchase_value,
    "q_top_type_per_user": q_top_type_per_user,
    "q_events_daily_ma7": q_events_daily_ma7,
    "q_order_price_quantiles": q_order_price_quantiles,
    "q_top_words": q_top_words,
    "q_customer_order_counts": q_customer_order_counts,
    "q_event_bursts": q_event_bursts,
    "q_doc_splits": q_doc_splits,
    "q_customers_no_urgent": q_customers_no_urgent,
    "q_top_orders_per_status": q_top_orders_per_status,
    "q_events_user_distinct_approx": q_events_user_distinct_approx,
    "q_events_value_quantiles_approx": q_events_value_quantiles_approx,
    "q_user_sessions": q_user_sessions,
    "q_events_asof_order": q_events_asof_order,
    "q_nation_customers": q_nation_customers,
    "q_part_type_stats": q_part_type_stats,
    "q_doc_token_stats": q_doc_token_stats,
    "q_doc_quality": q_doc_quality,
    "q_doc_dedup_stats": q_doc_dedup_stats,
    "q_corpus_prep": q_corpus_prep,
    "q_doc_exact_dedup_docs": q_doc_exact_dedup_docs,
    "q_lang_id": q_lang_id,
    "q_doc_fingerprints": q_doc_fingerprints,
    "q_doc_mentions": q_doc_mentions,
    "q_kg_jelly_roundtrip": q_kg_jelly_roundtrip,
    "q_embedding_sim_range": q_embedding_sim_range,
    "q_embedding_topk": q_embedding_topk,
    "q_embedding_pairs_exact": q_embedding_pairs_exact,
    "q_embedding_topk_multi": q_embedding_topk_multi,
    "q_embedding_label_stats": q_embedding_label_stats,
    "q_embedding_ivf_topk": q_embedding_ivf_topk,
    "q_embedding_dup_pairs": q_embedding_dup_pairs,
    "q_minhash_pairs": q_minhash_pairs,
    "q_ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "q_minhash_clusters": q_minhash_clusters,
    "q_simhash_pairs": q_simhash_pairs,
    "q_multimodal_features": q_multimodal_features,
}


# --------------------------------------------------------------------------
# late-round additions: count-distinct, JSON extraction, HAVING join-back,
# count distribution, conditional-aggregate ratio, scalar-subquery broadcast,
# fixed-width histogram
# --------------------------------------------------------------------------


def q_priority_distinct_custs(sf_dir: str):
    """Exact COUNT(DISTINCT) per group via the pair-hash two-phase exchange."""
    from ..stages.agg import grouped_count_distinct

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    return grouped_count_distinct(
        orders, "o_orderpriority", "o_custkey", out_name="n_custs"
    )


def q_event_props_stats(sf_dir: str):
    """Vectorized JSON field extraction → grouped aggregate (no row loop)."""
    from ..stages.text import json_int_field

    ev = _read(sf_dir, "events", ["event_type", "props"])
    parsed = ev.map_batches(
        lambda b: json_int_field(b, "props", "k").drop_columns(["props"]),
        batch_format="pyarrow",
    )
    return grouped_agg(
        parsed,
        ["event_type"],
        [("n_with_k", "k", "count"), ("sum_k", "k", "sum"), ("avg_k", "k", "mean")],
        round_to=6,
        sum_as_float=False,
    )


def q_big_quantity_orders(sf_dir: str):
    """HAVING + join-back (TPC-H Q18 shape): aggregate → filter → big⋈big."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    sums = grouped_agg(
        li, ["l_orderkey"], [("sum_qty", "l_quantity", "sum")], round_to=2
    )
    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), pa.scalar(250.0))),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    joined = hash_join(orders, big, left_key="o_orderkey", right_key="l_orderkey")
    return global_topk(
        joined, ["o_totalprice", "o_orderkey"], 100, descending=[True, False]
    )


def q_order_count_distribution(sf_dir: str):
    """Customer distribution (TPC-H Q13 shape): big⋈big LEFT OUTER with
    zero-fill, then a second-level count-of-counts aggregate."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    counts = grouped_agg(orders, ["o_custkey"], [("c_count", "o_custkey", "count")])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = hash_join(
        cust, counts, left_key="c_custkey", right_key="o_custkey", how="left outer"
    )

    def fill(b: pa.Table) -> pa.Table:
        n = pc.coalesce(b.column("c_count"), pa.scalar(0, pa.int64()))
        return pa.table({"c_count": n})

    filled = joined.map_batches(fill, batch_format="pyarrow")
    return grouped_agg(filled, ["c_count"], [("n_custs", "c_count", "count")])


def q_promo_revenue_share(sf_dir: str):
    """Conditional-aggregate ratio (TPC-H Q14 shape): CASE WHEN inside the
    map-side combiner, share finalized after the merge."""
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_returnflag"]
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = broadcast_join(
        li, part, left_key="l_partkey", right_key="p_partkey", columns=["p_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        promo = pc.if_else(
            pc.equal(b.column("p_type"), "PROMO"), rev, pa.scalar(0.0)
        )
        return pa.table(
            {"l_returnflag": b.column("l_returnflag"), "rev": rev, "promo_rev": promo}
        )

    prepped = joined.map_batches(prep, batch_format="pyarrow")
    agg = grouped_agg(
        prepped,
        ["l_returnflag"],
        [("sum_rev", "rev", "sum"), ("sum_promo", "promo_rev", "sum")],
    )

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        share = round_like_duckdb(
            pc.divide(b.column("sum_promo"), b.column("sum_rev")), 6
        )
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "promo_share": share,
                "sum_rev": round_like_duckdb(b.column("sum_rev"), 2),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_above_avg_orders(sf_dir: str):
    """Scalar-subquery broadcast (TPC-H Q22 shape): one global aggregate
    computed once on the driver, broadcast into the filter — no per-batch
    recompute, no shuffle."""
    orders = _read(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    )
    avg_price = orders.mean("o_totalprice")
    thresh = pa.scalar(float(avg_price))

    filtered = orders.map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), thresh)),
        batch_format="pyarrow",
    )
    return grouped_agg(
        filtered,
        ["o_orderpriority"],
        [("n_orders", "o_totalprice", "count"), ("sum_totalprice", "o_totalprice", "sum")],
        round_to=2,
    )


def q_price_histogram(sf_dir: str):
    """Fixed-width histogram of order totals: map-side binning + one small
    grouped-agg exchange."""
    from ..stages.agg import fixed_width_histogram

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return fixed_width_histogram(orders, "o_totalprice", 50000.0)


QUERIES.update(
    {
        "q_priority_distinct_custs": q_priority_distinct_custs,
        "q_event_props_stats": q_event_props_stats,
        "q_big_quantity_orders": q_big_quantity_orders,
        "q_order_count_distribution": q_order_count_distribution,
        "q_promo_revenue_share": q_promo_revenue_share,
        "q_above_avg_orders": q_above_avg_orders,
        "q_price_histogram": q_price_histogram,
    }
)

ORACLE_SQL.update(
    {
        "q_priority_distinct_custs": """
            SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
            FROM orders GROUP BY o_orderpriority
        """,
        "q_event_props_stats": """
            SELECT event_type,
                   count(k) AS n_with_k,
                   sum(k) AS sum_k,
                   round(avg(k), 6) AS avg_k
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            GROUP BY event_type
        """,
        "q_big_quantity_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                   round(sum_qty, 2) AS sum_qty
            FROM orders
            JOIN (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250
            ) ON o_orderkey = l_orderkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "q_order_count_distribution": """
            SELECT c_count, count(*) AS n_custs
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders ON o_custkey = c_custkey
                GROUP BY c_custkey
            )
            GROUP BY c_count
        """,
        "q_promo_revenue_share": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY l_returnflag
        """,
        "q_above_avg_orders": """
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_totalprice
            FROM orders
            WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
            GROUP BY o_orderpriority
        """,
        "q_price_histogram": """
            SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
                   count(*) AS n,
                   round(min(o_totalprice), 2) AS lo,
                   round(max(o_totalprice), 2) AS hi
            FROM orders
            GROUP BY bucket
        """,
    }
)


def q_doc_stratified_sample(sf_dir: str):
    """Deterministic k-per-group sample (balanced eval-set shape)."""
    from ..stages.sample import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return stratified_sample(docs, keys="lang", id_col="doc_id", k=3, seed="s7")


def q_latest_event_per_user(sf_dir: str):
    """Recency dedup: latest event per user (changelog/CDC shape)."""
    from ..stages.dedup import dedup_keep_latest

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])
    latest = dedup_keep_latest(ev, "user_id", "ts", tiebreak=["event_id"])

    def finish(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "event_type": b.column("event_type"),
                "value": round_like_duckdb(b.column("value"), 2),
            }
        )

    return latest.map_batches(finish, batch_format="pyarrow")


def q_events_above_type_avg(sf_dir: str):
    """Group-average join-back: rows above their own group's mean."""
    ev = _read(sf_dir, "events", ["event_type", "value"])
    avgs = grouped_agg(ev, ["event_type"], [("a", "value", "mean")])
    joined = broadcast_join(ev, avgs, left_key="event_type", columns=["a"])

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("value"), b.column("a")))

    filtered = joined.map_batches(above, batch_format="pyarrow")
    return grouped_agg(
        filtered,
        ["event_type"],
        [("n_above", "value", "count"), ("sum_above", "value", "sum")],
        round_to=2,
    )


def q_nation_pairs(sf_dir: str):
    """Self-join: ordered pairs of nations sharing a region."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    right = _to_table(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    ).rename_columns(["nb_nationkey", "nation_b", "n_regionkey"])
    paired = broadcast_join(nation, right, left_key="n_regionkey")

    def ordered(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("n_nationkey"), b.column("nb_nationkey")))
        return pa.table(
            {
                "nation_a": b.column("n_name"),
                "nation_b": b.column("nation_b"),
                "n_regionkey": b.column("n_regionkey"),
            }
        )

    pairs = paired.map_batches(ordered, batch_format="pyarrow")
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    withname = broadcast_join(
        pairs, region, left_key="n_regionkey", right_key="r_regionkey"
    )
    return withname.map_batches(
        lambda b: b.select(["nation_a", "nation_b", "r_name"]),
        batch_format="pyarrow",
    )


def q_events_iqr_outliers(sf_dir: str):
    """Per-group IQR outlier filter: exact quantiles → broadcast join-back."""
    from ..stages.agg import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    q = grouped_quantiles(
        ev, "event_type", "value", [("q1", 0.25), ("q3", 0.75)], round_to=2
    )
    joined = broadcast_join(ev, q, left_key="event_type", columns=["q1", "q3"])

    def outliers(b: pa.Table) -> pa.Table:
        iqr = pc.subtract(b.column("q3"), b.column("q1"))
        fence = pc.multiply(pa.scalar(1.5), iqr)
        hi = pc.add(b.column("q3"), fence)
        lo = pc.subtract(b.column("q1"), fence)
        mask = pc.or_(
            pc.greater(b.column("value"), hi), pc.less(b.column("value"), lo)
        )
        return b.filter(mask)

    filtered = joined.map_batches(outliers, batch_format="pyarrow")
    return grouped_agg(
        filtered,
        ["event_type"],
        [
            ("n_outliers", "value", "count"),
            ("min_out", "value", "min"),
            ("max_out", "value", "max"),
        ],
        round_to=2,
    )


QUERIES.update(
    {
        "q_doc_stratified_sample": q_doc_stratified_sample,
        "q_latest_event_per_user": q_latest_event_per_user,
        "q_events_above_type_avg": q_events_above_type_avg,
        "q_nation_pairs": q_nation_pairs,
        "q_events_iqr_outliers": q_events_iqr_outliers,
    }
)

ORACLE_SQL.update(
    {
        "q_doc_stratified_sample": """
            SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY substr(sha256('s7' || CAST(doc_id AS VARCHAR)), 1, 8),
                                    doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 3
        """,
        "q_latest_event_per_user": """
            SELECT user_id, ts, event_type, round(value, 2) AS value FROM (
                SELECT user_id, ts, event_type, value,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "q_events_above_type_avg": """
            SELECT event_type, count(*) AS n_above, round(sum(value), 2) AS sum_above
            FROM (
                SELECT event_type, value,
                       avg(value) OVER (PARTITION BY event_type) AS a
                FROM events
            )
            WHERE value > a
            GROUP BY event_type
        """,
        "q_nation_pairs": """
            SELECT a.n_name AS nation_a, b.n_name AS nation_b, r_name
            FROM nation a
            JOIN nation b
              ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
            JOIN region ON r_regionkey = a.n_regionkey
        """,
        "q_events_iqr_outliers": """
            WITH q AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.25), 2) AS q1,
                       round(quantile_cont(value, 0.75), 2) AS q3
                FROM events GROUP BY event_type
            )
            SELECT event_type,
                   count(*) AS n_outliers,
                   round(min(value), 2) AS min_out,
                   round(max(value), 2) AS max_out
            FROM events JOIN q USING (event_type)
            WHERE value > q3 + 1.5 * (q3 - q1) OR value < q1 - 1.5 * (q3 - q1)
            GROUP BY event_type
        """,
    }
)


def q_order_price_quantiles_disc(sf_dir: str):
    """Discrete (percentile_disc) per-status quantiles — always observed values."""
    from ..stages.agg import grouped_quantiles

    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    return grouped_quantiles(
        orders, ["o_orderstatus"], "o_totalprice",
        [("p50d_totalprice", 0.5), ("p90d_totalprice", 0.9)],
        round_to=2, interpolation="disc",
    )


def q_doc_bpe_token_stats(sf_dir: str):
    """BPE-ish token budgeting per language (one RE2 pass, no row loop)."""
    from ..stages.text import regex_token_counts

    docs = _read(sf_dir, "documents", ["lang", "text"])
    counted = docs.map_batches(
        lambda b: regex_token_counts(b).drop_columns(["text"]),
        batch_format="pyarrow",
    )
    return grouped_agg(
        counted,
        ["lang"],
        [
            ("n_docs", "n_bpe_tokens", "count"),
            ("sum_bpe", "n_bpe_tokens", "sum"),
            ("avg_bpe", "n_bpe_tokens", "mean"),
        ],
        round_to=6,
        sum_as_float=False,
    )


def q_monthly_revenue_trend(sf_dir: str):
    """Time-series rollup + month-over-month change (lag window on the
    aggregated series — the aggregate-then-window shape)."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import grouped_running

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def monthify(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b.column("o_orderdate"), unit="month")
        return pa.table({"month": month, "o_totalprice": b.column("o_totalprice")})

    monthly = grouped_agg(
        orders.map_batches(monthify, batch_format="pyarrow"),
        ["month"],
        [("revenue", "o_totalprice", "sum")],
        round_to=2,
    )
    # tiny aggregated series → single running-window partition
    keyed = monthly.map_batches(
        lambda b: b.append_column("g", pa.array([0] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    with_prev = grouped_running(
        keyed, key="g", order_col="month", value_col="revenue",
        kinds=[("prev_rev", "lag")],
    )

    def finish(b: pa.Table) -> pa.Table:
        mom = pc.divide(
            pc.subtract(b.column("revenue"), b.column("prev_rev")),
            b.column("prev_rev"),
        )
        return pa.table(
            {
                "month": b.column("month"),
                "revenue": b.column("revenue"),
                "mom_pct": round_like_duckdb(mom, 6),
            }
        )

    return with_prev.map_batches(finish, batch_format="pyarrow")


def q_top_bigrams(sf_dir: str):
    """Top-20 adjacent token pairs: vectorized flat-array bigram explode →
    count → global top-k."""
    from ..stages.text import bigrams

    docs = _read(sf_dir, "documents", ["text"])
    grams = docs.map_batches(bigrams, batch_format="pyarrow")
    counts = grouped_agg(grams, ["bigram"], [("n", "bigram", "count")])
    return global_topk(counts, ["n", "bigram"], 20, descending=[True, False])


QUERIES.update(
    {
        "q_order_price_quantiles_disc": q_order_price_quantiles_disc,
        "q_doc_bpe_token_stats": q_doc_bpe_token_stats,
        "q_monthly_revenue_trend": q_monthly_revenue_trend,
        "q_top_bigrams": q_top_bigrams,
    }
)

ORACLE_SQL.update(
    {
        "q_order_price_quantiles_disc": """
            SELECT o_orderstatus,
                   round(quantile_disc(o_totalprice, 0.5), 2) AS p50d_totalprice,
                   round(quantile_disc(o_totalprice, 0.9), 2) AS p90d_totalprice
            FROM orders
            GROUP BY o_orderstatus
        """,
        "q_doc_bpe_token_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   sum(n) AS sum_bpe,
                   round(avg(n), 6) AS avg_bpe
            FROM (
                SELECT lang,
                       length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n
                FROM documents
            )
            GROUP BY lang
        """,
        "q_monthly_revenue_trend": """
            WITH m AS (
                SELECT date_trunc('month', o_orderdate) AS month,
                       round(sum(o_totalprice), 2) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT month, revenue,
                   round((revenue - lag(revenue) OVER (ORDER BY month))
                         / lag(revenue) OVER (ORDER BY month), 6) AS mom_pct
            FROM m
        """,
        "q_top_bigrams": """
            WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
            g AS (
                SELECT unnest(
                    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                ) AS bigram FROM t
            )
            SELECT bigram, count(*) AS n FROM g
            GROUP BY bigram
            ORDER BY n DESC, bigram
            LIMIT 20
        """,
    }
)


def q_exists_late_ship(sf_dir: str):
    """EXISTS with a residual (both-sides) predicate (TPC-H Q4 shape): the
    non-equi condition can't ride the equi hash join, so it runs FUSED in
    the join reduce (``hash_join(post=)``) followed by a key-local distinct
    — the join output never re-exchanges and the EXISTS dedup is free."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def post(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), t.column("o_orderdate")))
        # join key == dedup key → per-partition distinct is globally correct
        return t.group_by(["o_orderkey", "o_orderpriority"]).aggregate([])

    j = hash_join(orders, li, left_key="o_orderkey", right_key="l_orderkey", post=post)
    return grouped_agg(j, ["o_orderpriority"], [("n", "o_orderkey", "count")])


def q_lineitem_profile(sf_dir: str):
    """Column profiler: unpivot → one grouped_agg pass + exact distinct
    counts per column, joined into a long-format stats table."""
    from ..stages.agg import grouped_count_distinct
    from ..stages.pivot import unpivot

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", cols)
    melted = unpivot(li, id_cols=[], value_cols=cols)
    stats = grouped_agg(
        melted,
        ["name"],
        [
            ("n", "value", "count"),
            ("lo", "value", "min"),
            ("hi", "value", "max"),
            ("mean", "value", "mean"),
        ],
    )

    def rounded(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        # lo/hi are exact observed values → 6 digits is safe; the mean of
        # ~|rows| doubles carries summation-order ulps (engine-dependent),
        # so 4 digits keeps it off rounding boundaries
        return pa.table(
            {
                "name": b.column("name"),
                "n": b.column("n"),
                "lo": round_like_duckdb(b.column("lo"), 6),
                "hi": round_like_duckdb(b.column("hi"), 6),
                "mean": round_like_duckdb(b.column("mean"), 4),
            }
        )

    stats = stats.map_batches(rounded, batch_format="pyarrow")
    nd = grouped_count_distinct(melted, "name", "value", out_name="n_distinct")
    return broadcast_join(stats, nd, left_key="name")


QUERIES.update(
    {
        "q_exists_late_ship": q_exists_late_ship,
        "q_lineitem_profile": q_lineitem_profile,
    }
)

ORACLE_SQL.update(
    {
        "q_exists_late_ship": """
            SELECT o_orderpriority, count(*) AS n
            FROM orders
            WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
            )
            GROUP BY o_orderpriority
        """,
        "q_lineitem_profile": """
            SELECT name,
                   count(*) AS n,
                   round(min(value), 6) AS lo,
                   round(max(value), 6) AS hi,
                   round(avg(value), 4) AS mean,
                   count(DISTINCT value) AS n_distinct
            FROM (
                UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
                         FROM lineitem)
                ON l_quantity, l_extendedprice, l_discount, l_tax
                INTO NAME name VALUE value
            )
            GROUP BY name
        """,
    }
)


def q_supplier_part_pagerank(sf_dir: str):
    """Iterative distributed PageRank over the supplier→part supply graph
    (distinct edges from lineitem), 5 iterations — each iteration is three
    keyed hash exchanges, no driver materialization of edges or ranks."""
    from ..stages.graph import pagerank

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows), pc.cast(b.column("l_suppkey"), pa.string()), ""
        )
        d = pc.binary_join_element_wise(
            pa.array(["p"] * b.num_rows), pc.cast(b.column("l_partkey"), pa.string()), ""
        )
        return pa.table({"src": s, "dst": d})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    distinct = grouped_agg(edges, ["src", "dst"], [("n", "src", "count")])
    edges = distinct.map_batches(
        lambda b: b.drop_columns(["n"]), batch_format="pyarrow"
    )
    return pagerank(edges, damping=0.85, iters=5, num_partitions=8, round_to=8)


QUERIES["q_supplier_part_pagerank"] = q_supplier_part_pagerank


def _pagerank_sql() -> str:
    from ..stages.graph import pagerank_sql

    edges = (
        "SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
        "'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem"
    )
    return pagerank_sql(edges, damping=0.85, iters=5, round_to=8)


ORACLE_SQL["q_supplier_part_pagerank"] = _pagerank_sql()


def q_doc_lang_components(sf_dir: str):
    """Distributed connected components over REAL multi-hop chains: each
    language's docs linked consecutively by doc_id (built with a lag
    window), so one component per language whose id is the language's min
    doc_id — propagation must cross the whole chain (pointer jumping makes
    that O(log chain length) rounds)."""
    from ..stages.graph import connected_components
    from ..stages.window import grouped_running

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    with_prev = grouped_running(
        docs, key="lang", order_col="doc_id", value_col="doc_id",
        kinds=[("prev_id", "lag")],
    )

    def to_edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("prev_id")))
        return pa.table(
            {
                "src": pc.cast(b.column("prev_id"), pa.int64()),
                "dst": b.column("doc_id"),
            }
        )

    edges = with_prev.map_batches(to_edges, batch_format="pyarrow")
    cc = connected_components(edges, num_partitions=8)
    # left join back so a single-doc language would keep its own id
    joined = hash_join(
        docs.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow"),
        cc,
        left_key="doc_id",
        right_key="node",
        how="left outer",
        num_partitions=8,
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "component": pc.coalesce(b.column("component"), b.column("doc_id")),
            }
        ),
        batch_format="pyarrow",
    )


QUERIES["q_doc_lang_components"] = q_doc_lang_components
ORACLE_SQL["q_doc_lang_components"] = """
    SELECT doc_id, min(doc_id) OVER (PARTITION BY lang) AS component
    FROM documents
"""


def q_events_value_locf(sf_dir: str):
    """Per-key forward-fill imputation (LOCF): mask error-event values to
    NULL, then carry the last observation forward per user in event-time
    order — one keyed exchange, vectorized per-run fill."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def mask(b: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(b.column("event_type"), "error"),
            pa.scalar(None, pa.float64()),
            b.column("value"),
        )
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "event_id": b.column("event_id"),
                "v": v,
            }
        )

    masked = ev.map_batches(mask, batch_format="pyarrow")
    filled = grouped_running(
        masked, key="user_id", order_col="ts", value_col="v",
        kinds=[("filled", "locf")], round_to=2, tiebreak="event_id",
    )
    return filled.map_batches(
        lambda b: b.select(["user_id", "ts", "filled"]), batch_format="pyarrow"
    )


QUERIES["q_events_value_locf"] = q_events_value_locf
ORACLE_SQL["q_events_value_locf"] = """
    SELECT user_id, ts,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS filled
    FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
"""


def q_user_event_sequence(sf_dir: str):
    """Per-user ordered event-type sequence (SQL string_agg ORDER BY) — the
    session-sequence feature, built by the vectorized ordered collect."""
    from ..stages.agg import grouped_collect

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return grouped_collect(
        ev, "user_id", "event_type", order_by=["ts", "event_id"],
        out_name="seq",
    )


def q_events_value_zscore(sf_dir: str):
    """Per-group z-score feature scaling: grouped mean/std (mergeable
    moments) broadcast back onto the rows."""
    from ..stages.agg import round_like_duckdb

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    stats = grouped_agg(
        ev, ["event_type"], [("mu", "value", "mean"), ("sd", "value", "std")]
    )
    joined = broadcast_join(ev, stats, left_key="event_type", columns=["mu", "sd"])

    def z(b: pa.Table) -> pa.Table:
        zv = pc.divide(pc.subtract(b.column("value"), b.column("mu")), b.column("sd"))
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "zvalue": round_like_duckdb(zv, 6),
            }
        )

    return joined.map_batches(z, batch_format="pyarrow")


def q_doc_tfidf_top_terms(sf_dir: str):
    """TF-IDF: token explode → per-(doc,term) tf → document frequency →
    big⋈big join on term → tf·ln(N/df), global top-30."""
    import math

    from ..stages.agg import round_like_duckdb

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def toks(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        ids = pc.list_parent_indices(split)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(ids),
                "token": pc.list_flatten(split),
            }
        )

    exploded = docs.map_batches(toks, batch_format="pyarrow")
    tf = grouped_agg(exploded, ["doc_id", "token"], [("tf", "token", "count")])
    df = grouped_agg(tf, ["token"], [("df", "token", "count")])
    joined = hash_join(tf, df, left_key="token", num_partitions=8)

    def tfidf(b: pa.Table) -> pa.Table:
        idf = pc.ln(
            pc.divide(
                pa.scalar(float(n_docs)), pc.cast(b.column("df"), pa.float64())
            )
        )
        v = pc.multiply(pc.cast(b.column("tf"), pa.float64()), idf)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "token": b.column("token"),
                "tfidf": round_like_duckdb(v, 6),
            }
        )

    scored = joined.map_batches(tfidf, batch_format="pyarrow")
    return global_topk(
        scored, ["tfidf", "doc_id", "token"], 30, descending=[True, False, False]
    )


QUERIES.update(
    {
        "q_user_event_sequence": q_user_event_sequence,
        "q_events_value_zscore": q_events_value_zscore,
        "q_doc_tfidf_top_terms": q_doc_tfidf_top_terms,
    }
)

ORACLE_SQL.update(
    {
        "q_user_event_sequence": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        """,
        "q_events_value_zscore": """
            SELECT event_id, event_type,
                   round((value - avg(value) OVER w)
                         / stddev_samp(value) OVER w, 6) AS zvalue
            FROM events
            WINDOW w AS (PARTITION BY event_type)
        """,
        "q_doc_tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents
            ),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS cnt FROM documents)
            SELECT doc_id, token,
                   round(tf * ln((SELECT cnt FROM n) / CAST(df AS DOUBLE)), 6) AS tfidf
            FROM tf JOIN df USING (token)
            ORDER BY tfidf DESC, doc_id, token
            LIMIT 30
        """,
    }
)


def q_events_trailing_week(sf_dir: str):
    """Per-event trailing 7-day count/sum for the same user (RANGE-frame
    retrospective features, vectorized searchsorted windows)."""
    from ..stages.window import grouped_trailing_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_trailing_agg(
        ev, key="user_id", ts_col="ts", value_col="value",
        width_s=7 * 24 * 3600.0,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "ts", "w_count", "w_sum"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_trailing_week"] = q_events_trailing_week
ORACLE_SQL["q_events_trailing_week"] = """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS w_count,
           round(sum(value) OVER w, 2) AS w_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
"""


def q_monthly_distinct_pairs(sf_dir: str):
    """Composite COUNT(DISTINCT (user_id, event_type)) per day."""
    from ..stages.agg import grouped_count_distinct

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def monthify(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(b.column("ts"), format="%Y-%m-%d"),
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
            }
        )

    return grouped_count_distinct(
        ev.map_batches(monthify, batch_format="pyarrow"),
        "month", ["user_id", "event_type"], out_name="n_pairs",
    )


QUERIES["q_monthly_distinct_pairs"] = q_monthly_distinct_pairs
ORACLE_SQL["q_monthly_distinct_pairs"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS month,
           count(DISTINCT (user_id, event_type)) AS n_pairs
    FROM events GROUP BY month
"""


def q_doc_normalized_vocab(sf_dir: str):
    """Vocabulary size per language after normalization (lowercase + digit
    collapse) — one vectorized regex pass + composite distinct count."""
    from ..stages.agg import grouped_count_distinct

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def norm_tokens(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        ids = pc.list_parent_indices(split)
        tok = pc.utf8_lower(pc.list_flatten(split))
        tok = pc.replace_substring_regex(tok, pattern="[0-9]+", replacement="0")
        return pa.table({"lang": b.column("lang").take(ids), "token": tok})

    toks = docs.map_batches(norm_tokens, batch_format="pyarrow")
    return grouped_count_distinct(toks, "lang", "token", out_name="vocab")


QUERIES["q_doc_normalized_vocab"] = q_doc_normalized_vocab
ORACLE_SQL["q_doc_normalized_vocab"] = """
    SELECT lang,
           count(DISTINCT regexp_replace(lower(token), '[0-9]+', '0', 'g')) AS vocab
    FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    GROUP BY lang
"""


def q_click_next_purchase(sf_dir: str):
    """Time-to-conversion: each click's NEXT purchase by the same user
    (forward as-of join; null when the user never purchases again)."""
    from ..stages.joins import asof_join_forward

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "click")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    purchases = ev.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "purchase")).select(
            ["user_id", "ts"]
        ),
        batch_format="pyarrow",
    )
    joined = asof_join_forward(
        clicks, purchases,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        right_value="ts", out_value="np_us",
        left_cols={"event_id": pa.int64(), "user_id": pa.int64(),
                   "ts": pa.timestamp("us")},
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "next_purchase_ts": pc.cast(b.column("np_us"), pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )


QUERIES["q_click_next_purchase"] = q_click_next_purchase
ORACLE_SQL["q_click_next_purchase"] = """
    SELECT c.event_id, c.user_id, c.ts, p.ts AS next_purchase_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def q_customer_balance_deciles(sf_dir: str):
    """Decile report: global ntile(10) over account balance, then per-decile
    stats (the aggregate-after-window composition)."""
    from ..stages.window import grouped_running

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    keyed = cust.map_batches(
        lambda b: b.append_column("g", pa.array([0] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    tiled = grouped_running(
        keyed, key="g", order_col="c_acctbal", value_col="c_acctbal",
        kinds=[("decile", ("ntile", 10))], tiebreak="c_custkey",
    )
    return grouped_agg(
        tiled,
        ["decile"],
        [
            ("n_custs", "c_acctbal", "count"),
            ("lo", "c_acctbal", "min"),
            ("hi", "c_acctbal", "max"),
            ("avg_bal", "c_acctbal", "mean"),
        ],
        round_to=2,
    )


QUERIES["q_customer_balance_deciles"] = q_customer_balance_deciles
ORACLE_SQL["q_customer_balance_deciles"] = """
    SELECT decile,
           count(*) AS n_custs,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM (
        SELECT c_acctbal,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    GROUP BY decile
"""


def q_returned_revenue_top_customers(sf_dir: str):
    """TPC-H Q10 shape: returned-item revenue per customer — big⋈big join
    with a map-side partial aggregate fused into the join reduce, then the
    customer/nation dims broadcast onto the small aggregate."""
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li = li.map_batches(returned, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def partial_by_cust(t: pa.Table) -> pa.Table:
        # join key (o_orderkey) != group key (o_custkey): this inside-join
        # aggregate is a PARTIAL per co-partition; the grouped_agg below
        # merges partials with one tiny exchange
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey",
        post=partial_by_cust,
    )
    per_cust = grouped_agg(
        joined, ["o_custkey"], [("revenue", "rev", "sum")], round_to=2
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    withc = broadcast_join(
        per_cust, cust, left_key="o_custkey", right_key="c_custkey",
        columns=["c_name", "c_nationkey"],
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    withn = broadcast_join(
        withc, nation, left_key="c_nationkey", right_key="n_nationkey",
        columns=["n_name"],
    )
    named = withn.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("o_custkey"),
                "c_name": b.column("c_name"),
                "n_name": b.column("n_name"),
                "revenue": b.column("revenue"),
            }
        ),
        batch_format="pyarrow",
    )
    return global_topk(named, ["revenue", "c_custkey"], 20, descending=[True, False])


def q_disjunctive_part_revenue(sf_dir: str):
    """TPC-H Q19 shape: disjunction of composite predicates across both
    join sides, evaluated as one vectorized boolean expression."""
    from ..stages.agg import round_like_duckdb

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    joined = broadcast_join(
        li, part, left_key="l_partkey", right_key="p_partkey",
        columns=["p_brand", "p_type", "p_size"],
    )

    def pick(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity")
        c1 = pc.and_(
            pc.and_(
                pc.equal(b.column("p_brand"), "Brand#1"),
                pc.less_equal(b.column("p_size"), 10),
            ),
            pc.greater_equal(qty, 10.0),
        )
        c2 = pc.and_(
            pc.and_(
                pc.equal(b.column("p_type"), "PROMO"),
                pc.less(qty, 25.0),
            ),
            pc.greater(b.column("l_discount"), 0.04),
        )
        c3 = pc.and_(
            pc.and_(
                pc.greater_equal(b.column("p_size"), 40),
                pc.greater_equal(qty, 20.0),
            ),
            pc.less_equal(qty, 30.0),
        )
        b = b.filter(pc.or_(pc.or_(c1, c2), c3))
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table({"rev": rev})

    picked = joined.map_batches(pick, batch_format="pyarrow")
    agg = grouped_agg(
        picked.map_batches(
            lambda b: b.append_column("g", pa.array([0] * b.num_rows, pa.int64())),
            batch_format="pyarrow",
        ),
        ["g"],
        [("n_items", "rev", "count"), ("revenue", "rev", "sum")],
        round_to=2,
    )
    return agg.map_batches(
        lambda b: b.drop_columns(["g"]), batch_format="pyarrow"
    )


QUERIES.update(
    {
        "q_returned_revenue_top_customers": q_returned_revenue_top_customers,
        "q_disjunctive_part_revenue": q_disjunctive_part_revenue,
    }
)

ORACLE_SQL.update(
    {
        "q_returned_revenue_top_customers": """
            SELECT c_custkey, c_name, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON n_nationkey = c_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "q_disjunctive_part_revenue": """
            SELECT count(*) AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
               OR (p_type = 'PROMO' AND l_quantity < 25 AND l_discount > 0.04)
               OR (p_size >= 40 AND l_quantity BETWEEN 20 AND 30)
        """,
    }
)


def q_supplier_nation_profit(sf_dir: str):
    """TPC-H Q9 shape: profit rolled up the SUPPLIER dimension path (q5
    uses the customer path) — derived measure, two broadcast dims, one
    grouped aggregate."""
    li = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def measure(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        cost = pc.multiply(pa.scalar(0.6), b.column("l_extendedprice"))
        return pa.table(
            {"l_suppkey": b.column("l_suppkey"), "profit": pc.subtract(rev, cost)}
        )

    li = li.map_batches(measure, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    withs = broadcast_join(
        li, supp, left_key="l_suppkey", right_key="s_suppkey",
        columns=["s_nationkey"],
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    withn = broadcast_join(
        withs, nation, left_key="s_nationkey", right_key="n_nationkey",
        columns=["n_name"],
    )
    return grouped_agg(withn, ["n_name"], [("profit", "profit", "sum")], round_to=2)


def q_brand_type_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, type) over a
    filtered part dimension — broadcast semi-filterable join + composite-
    group exact count-distinct."""
    from ..stages.agg import grouped_count_distinct

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    big_parts = part.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("p_size"), 25)),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    joined = broadcast_join(
        li, big_parts, left_key="l_partkey", right_key="p_partkey",
        columns=["p_brand", "p_type"],
    )
    return grouped_count_distinct(
        joined, ["p_brand", "p_type"], "l_suppkey", out_name="n_supp"
    )


QUERIES.update(
    {
        "q_supplier_nation_profit": q_supplier_nation_profit,
        "q_brand_type_supplier_counts": q_brand_type_supplier_counts,
    }
)

ORACLE_SQL.update(
    {
        "q_supplier_nation_profit": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * l_extendedprice), 2) AS profit
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "q_brand_type_supplier_counts": """
            SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_size >= 25
            GROUP BY p_brand, p_type
        """,
    }
)


def q_user_day_streaks(sf_dir: str):
    """Gaps-and-islands: longest consecutive-day activity streak per user
    (distinct days → row_number window → island id = day − rank → two
    aggregates)."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": b.column("user_id"), "day": day})

    days = grouped_agg(
        ev.map_batches(day_of, batch_format="pyarrow"),
        ["user_id", "day"], [("n", "day", "count")],
    ).map_batches(lambda b: b.drop_columns(["n"]), batch_format="pyarrow")

    ranked = grouped_running(
        days, key="user_id", order_col="day", value_col="day",
        kinds=[("rn", "row_number")],
    )

    def island(b: pa.Table) -> pa.Table:
        grp = pc.subtract(b.column("day"), b.column("rn"))
        return pa.table({"user_id": b.column("user_id"), "grp": grp})

    islands = ranked.map_batches(island, batch_format="pyarrow")
    lengths = grouped_agg(islands, ["user_id", "grp"], [("len", "grp", "count")])
    return grouped_agg(lengths, ["user_id"], [("max_streak", "len", "max")])


QUERIES["q_user_day_streaks"] = q_user_day_streaks
ORACLE_SQL["q_user_day_streaks"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events
    ),
    isl AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM days
    ),
    streaks AS (SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, grp)
    SELECT user_id, max(len) AS max_streak FROM streaks GROUP BY user_id
"""


def q_embedding_kmeans_sizes(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table (mergeable
    per-block partials, tiny driver merge), reporting cluster sizes.
    No SQL equivalent — rows-only; convergence is pinned by the blob-
    recovery unit test."""
    from ..stages.ann import kmeans_assign, kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids, _ = kmeans_fit(emb, k=8, iters=5)
    assigned = kmeans_assign(emb, centroids)
    return grouped_agg(assigned, ["cluster"], [("n", "vec_id", "count")])


QUERIES["q_embedding_kmeans_sizes"] = q_embedding_kmeans_sizes


def q_supplier_part_pagerank_weighted(sf_dir: str):
    """Weighted PageRank: edge weight = lineitem count per (supplier, part)
    pair, contributions ∝ rank·w/Σw(out)."""
    from ..stages.graph import pagerank

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows), pc.cast(b.column("l_suppkey"), pa.string()), ""
        )
        d = pc.binary_join_element_wise(
            pa.array(["p"] * b.num_rows), pc.cast(b.column("l_partkey"), pa.string()), ""
        )
        return pa.table({"src": s, "dst": d})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    weighted = grouped_agg(
        edges, ["src", "dst"], [("w", "src", "count")], sum_as_float=False
    )
    return pagerank(weighted, weight="w", damping=0.85, iters=4,
                    num_partitions=8, round_to=8)


QUERIES["q_supplier_part_pagerank_weighted"] = q_supplier_part_pagerank_weighted


def _pagerank_weighted_sql() -> str:
    from ..stages.graph import pagerank_sql

    edges = (
        "SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src, "
        "'p' || CAST(l_partkey AS VARCHAR) AS dst, count(*) AS w "
        "FROM lineitem GROUP BY 1, 2"
    )
    return pagerank_sql(edges, weight="w", damping=0.85, iters=4, round_to=8)


ORACLE_SQL["q_supplier_part_pagerank_weighted"] = _pagerank_weighted_sql()


def q_late_supplier_blame(sf_dir: str):
    """TPC-H Q21 shape (multi-EXISTS): orders with >1 distinct supplier
    where EXACTLY ONE supplier shipped late (>60 days after the order
    date); count blamed orders per supplier.  The whole per-order analysis
    (distinct-supplier counts, late set, blamed pick) is key-local on the
    join key, so it runs fused inside the hash-join reduce — one exchange
    for the heavy part, then a tiny per-supplier aggregate."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    sixty_days_us = 60 * 86_400 * 1_000_000

    def per_order(t: pa.Table) -> pa.Table:
        ship = pc.cast(t.column("l_shipdate"), pa.int64())
        cutoff = pc.add(
            pc.cast(t.column("o_orderdate"), pa.int64()),
            pa.scalar(sixty_days_us, pa.int64()),
        )
        late_mask = pc.greater(ship, cutoff)
        base = pa.table(
            {"l_orderkey": t.column("l_orderkey"), "l_suppkey": t.column("l_suppkey")}
        )
        n_supp = base.group_by("l_orderkey").aggregate(
            [("l_suppkey", "count_distinct")]
        ).rename_columns(["l_orderkey", "n_supp"])
        late = base.filter(late_mask)
        late_stats = late.group_by("l_orderkey").aggregate(
            [("l_suppkey", "count_distinct"), ("l_suppkey", "min")]
        ).rename_columns(["l_orderkey", "n_late", "supp"])
        j = n_supp.join(late_stats, keys=["l_orderkey"], join_type="inner")
        j = j.filter(
            pc.and_(
                pc.greater(j.column("n_supp"), 1), pc.equal(j.column("n_late"), 1)
            )
        )
        return pa.table({"supp": j.column("supp")})

    blamed = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=per_order
    )
    counts = grouped_agg(blamed, ["supp"], [("numwait", "supp", "count")])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    named = broadcast_join(
        counts, supplier, left_key="supp", right_key="s_suppkey", columns=["s_name"]
    ).map_batches(
        lambda b: b.select(["s_name", "numwait"]), batch_format="pyarrow"
    )
    return global_topk(named, ["numwait", "s_name"], 10, descending=[True, False])


QUERIES["q_late_supplier_blame"] = q_late_supplier_blame
ORACLE_SQL["q_late_supplier_blame"] = """
    WITH per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                   THEN l_suppkey END) AS n_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY l_orderkey
    ),
    blamed AS (
        SELECT l.l_orderkey, min(l.l_suppkey) AS supp
        FROM lineitem l JOIN orders o ON o_orderkey = l.l_orderkey
        JOIN per_order p ON p.l_orderkey = l.l_orderkey
        WHERE p.n_supp > 1 AND p.n_late = 1
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY l.l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM blamed JOIN supplier ON s_suppkey = supp
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
"""


def q_events_dow_hour_heatmap(sf_dir: str):
    """Temporal-field extraction: event counts + mean value by (ISO day of
    week, hour) — the activity-heatmap rollup."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def fields(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b.column("ts")), pa.scalar(1, pa.int64()))
        return pa.table(
            {
                "dow": pc.cast(dow, pa.int64()),
                "hour": pc.cast(pc.hour(b.column("ts")), pa.int64()),
                "value": b.column("value"),
            }
        )

    return grouped_agg(
        ev.map_batches(fields, batch_format="pyarrow"),
        ["dow", "hour"],
        [("n", "value", "count"), ("sum_value", "value", "sum")],
        round_to=2,
    )


def q_order_priority_share(sf_dir: str):
    """Percent-of-total (ratio-to-report): each priority's share of global
    order revenue — one grouped aggregate + a driver-side scalar."""
    from ..stages.agg import round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    per = grouped_agg(
        orders, ["o_orderpriority"], [("rev", "o_totalprice", "sum")]
    ).materialize()
    total = sum(r["rev"] for r in per.take_all())

    def share(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "rev": round_like_duckdb(b.column("rev"), 2),
                "share": round_like_duckdb(
                    pc.divide(b.column("rev"), pa.scalar(total)), 6
                ),
            }
        )

    return per.map_batches(share, batch_format="pyarrow")


QUERIES.update(
    {
        "q_events_dow_hour_heatmap": q_events_dow_hour_heatmap,
        "q_order_priority_share": q_order_priority_share,
    }
)

ORACLE_SQL.update(
    {
        "q_events_dow_hour_heatmap": """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY dow, hour
        """,
        "q_order_priority_share": """
            SELECT o_orderpriority,
                   round(sum(o_totalprice), 2) AS rev,
                   round(sum(o_totalprice)
                         / (SELECT sum(o_totalprice) FROM orders), 6) AS share
            FROM orders
            GROUP BY o_orderpriority
        """,
    }
)


def q_doc_merge_upsert(sf_dir: str):
    """CDC MERGE: apply a deterministic change set (updates, deletes,
    inserts; conflicting update+delete resolved by sequence) onto the
    documents table — one keyed exchange, last-write-wins."""
    from ..stages.dedup import merge_upsert

    base = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def make_changes(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id")
        parts = []
        upd = b.filter(pc.equal(pc.subtract(doc, pc.multiply(pc.divide(doc, 7), 7)), 0))
        parts.append(
            pa.table(
                {
                    "doc_id": upd.column("doc_id"),
                    "lang": upd.column("lang"),
                    "n_chars": pc.add(upd.column("n_chars"), pa.scalar(1000, pa.int64())),
                    "op": pa.array(["update"] * upd.num_rows, pa.string()),
                    "seq": pa.array([1] * upd.num_rows, pa.int64()),
                }
            )
        )
        dele = b.filter(pc.equal(pc.subtract(doc, pc.multiply(pc.divide(doc, 13), 13)), 0))
        parts.append(
            pa.table(
                {
                    "doc_id": dele.column("doc_id"),
                    "lang": dele.column("lang"),
                    "n_chars": dele.column("n_chars"),
                    "op": pa.array(["delete"] * dele.num_rows, pa.string()),
                    "seq": pa.array([2] * dele.num_rows, pa.int64()),
                }
            )
        )
        ins = b.filter(pc.equal(pc.subtract(doc, pc.multiply(pc.divide(doc, 17), 17)), 0))
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(ins.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
                    "lang": ins.column("lang"),
                    "n_chars": ins.column("n_chars"),
                    "op": pa.array(["insert"] * ins.num_rows, pa.string()),
                    "seq": pa.array([1] * ins.num_rows, pa.int64()),
                }
            )
        )
        return pa.concat_tables(parts)

    changes = base.map_batches(make_changes, batch_format="pyarrow")
    return merge_upsert(base, changes, key="doc_id", seq_col="seq")


QUERIES["q_doc_merge_upsert"] = q_doc_merge_upsert
ORACLE_SQL["q_doc_merge_upsert"] = """
    WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
    changes AS (
        SELECT doc_id, lang, n_chars + 1000 AS n_chars, 'update' AS op, 1 AS seq
        FROM base WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars, 'delete', 2 FROM base WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id + 1000000, lang, n_chars, 'insert', 1
        FROM base WHERE doc_id % 17 = 0
    ),
    last_change AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    )
    SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
           COALESCE(c.lang, b.lang) AS lang,
           COALESCE(c.n_chars, b.n_chars) AS n_chars
    FROM base b FULL OUTER JOIN last_change c ON b.doc_id = c.doc_id
    WHERE COALESCE(c.op, 'keep') != 'delete'
"""


def q_doc_merge_diff(sf_dir: str):
    """Snapshot diff of the CDC merge: which doc_ids were added, removed
    or changed by the change set (fused classify inside a FULL OUTER
    co-partition)."""
    from ..stages.joins import table_diff

    base = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    merged = q_doc_merge_upsert(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )
    return table_diff(base, merged, key="doc_id", compare_cols=["n_chars"])


QUERIES["q_doc_merge_diff"] = q_doc_merge_diff
ORACLE_SQL["q_doc_merge_diff"] = """
    WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
    changes AS (
        SELECT doc_id, lang, n_chars + 1000 AS n_chars, 'update' AS op, 1 AS seq
        FROM base WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars, 'delete', 2 FROM base WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id + 1000000, lang, n_chars, 'insert', 1
        FROM base WHERE doc_id % 17 = 0
    ),
    last_change AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    ),
    merged AS (
        SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
               COALESCE(c.n_chars, b.n_chars) AS n_chars
        FROM base b FULL OUTER JOIN last_change c ON b.doc_id = c.doc_id
        WHERE COALESCE(c.op, 'keep') != 'delete'
    )
    SELECT COALESCE(b.doc_id, m.doc_id) AS doc_id,
           CASE WHEN m.doc_id IS NULL THEN 'removed'
                WHEN b.doc_id IS NULL THEN 'added'
                ELSE 'changed' END AS change
    FROM base b FULL OUTER JOIN merged m ON b.doc_id = m.doc_id
    WHERE m.doc_id IS NULL OR b.doc_id IS NULL OR b.n_chars != m.n_chars
"""


def q_events_importance_sample(sf_dir: str):
    """Deterministic importance sampling: events kept with probability
    proportional to value (hash-decided, shuffle-free, audit-reproducible),
    then summarized per type."""
    from ..stages.sample import weighted_hash_sample

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    kept = weighted_hash_sample(
        ev, id_col="event_id", weight_col="value", max_weight=500.0, seed="w1"
    )
    return grouped_agg(
        kept,
        ["event_type"],
        [("n_kept", "value", "count"), ("sum_value", "value", "sum")],
        round_to=2,
    )


QUERIES["q_events_importance_sample"] = q_events_importance_sample


def _importance_sample_sql() -> str:
    from ..stages.sample import sql_weighted_sample_predicate

    pred = sql_weighted_sample_predicate(
        "CAST(event_id AS VARCHAR)", "value", 500.0, seed="w1"
    )
    return f"""
        SELECT event_type,
               count(*) AS n_kept,
               round(sum(value), 2) AS sum_value
        FROM events
        WHERE {pred}
        GROUP BY event_type
    """


ORACLE_SQL["q_events_importance_sample"] = _importance_sample_sql()


def q_lineitem_price_regression(sf_dir: str):
    """Per-group OLS regression (price on quantity) from the same mergeable
    moment partials that power corr/var — regr_slope / regr_intercept."""
    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    return grouped_agg(
        li,
        ["l_returnflag"],
        [
            ("slope", ("l_quantity", "l_extendedprice"), "slope"),
            ("intercept", ("l_quantity", "l_extendedprice"), "intercept"),
            ("n", "l_quantity", "count"),
        ],
        round_to=4,
    )


QUERIES["q_lineitem_price_regression"] = q_lineitem_price_regression
ORACLE_SQL["q_lineitem_price_regression"] = """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""


def q_event_funnel(sf_dir: str):
    """Windowed conversion funnel view→click→purchase (12 h conversion
    window per step): users reaching each stage."""
    from ..stages.window import funnel_stages

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    stages = funnel_stages(
        ev, key="user_id", ts_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"], within_s=12 * 3600.0,
    )

    def counts(b: pa.Table) -> pa.Table:
        import numpy as np

        st = b.column("stage").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_step1": pa.array([int((st >= 1).sum())], pa.int64()),
                "n_step2": pa.array([int((st >= 2).sum())], pa.int64()),
                "n_step3": pa.array([int((st >= 3).sum())], pa.int64()),
            }
        )

    partials = stages.map_batches(counts, batch_format="pyarrow", batch_size=None)
    return grouped_agg(
        partials.map_batches(
            lambda b: b.append_column("g", pa.array([0] * b.num_rows, pa.int64())),
            batch_format="pyarrow",
        ),
        ["g"],
        [
            ("n_step1", "n_step1", "sum"),
            ("n_step2", "n_step2", "sum"),
            ("n_step3", "n_step3", "sum"),
        ],
        sum_as_float=False,
    ).map_batches(lambda b: b.drop_columns(["g"]), batch_format="pyarrow")


QUERIES["q_event_funnel"] = q_event_funnel
ORACLE_SQL["q_event_funnel"] = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
         AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 12 HOUR
        WHERE event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
         AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 12 HOUR
        WHERE event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_step1,
           (SELECT count(*) FROM c) AS n_step2,
           (SELECT count(*) FROM p) AS n_step3
"""


# --------------------------------------------------------------------------
# Eighth pass: remaining TPC-H shapes (Q2/Q7/Q11/Q12/Q15/Q17/Q20),
# similarity-graph triangle counting, higher-moment aggregates
# --------------------------------------------------------------------------


def q_order_price_shape(sf_dir: str):
    """Distribution-shape aggregates per order status: skewness and excess
    kurtosis of the order totals from mergeable higher moments (Σx, Σx²,
    Σx³, Σx⁴ partials per batch — the same one-exchange pattern as
    var/corr, so the 100 TB path ships four doubles per group per block)."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    return grouped_agg(
        orders,
        ["o_orderstatus"],
        [
            ("n_orders", "o_totalprice", "count"),
            ("price_skew", "o_totalprice", "skew"),
            ("price_kurt", "o_totalprice", "kurt"),
        ],
        round_to=6,
    )


def q_avg_yearly_small_qty(sf_dir: str):
    """TPC-H Q17 shape: revenue loss if small-quantity orders (below half
    the part's own average quantity) went unfilled — a correlated-AVG
    threshold.  The per-part average is a grouped aggregate joined back
    onto the fact rows (broadcast here: it is |parts-of-one-brand| rows;
    swap to ``hash_join`` when the dimension itself is huge)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    brand = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_brand"), "Brand#13")),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    li = broadcast_semi(li, brand, left_key="l_partkey", right_key="p_partkey")
    avg_t = grouped_agg(
        li, ["l_partkey"], [("avg_qty", "l_quantity", "mean")], round_to=6
    )
    joined = broadcast_join(li, avg_t, left_key="l_partkey", columns=["avg_qty"])

    def small(b: pa.Table) -> pa.Table:
        keep = pc.less(
            b.column("l_quantity"),
            pc.multiply(pa.scalar(0.5, pa.float64()), b.column("avg_qty")),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "s": pa.array(
                    [pc.sum(b.column("l_extendedprice")).as_py() or 0.0],
                    pa.float64(),
                ),
            }
        )

    partials = joined.map_batches(small, batch_format="pyarrow", batch_size=None)
    total = grouped_agg(partials, ["g"], [("s", "s", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        v = pc.divide(b.column("s"), pa.scalar(7.0, pa.float64()))
        return pa.table({"avg_yearly": round_like_duckdb(v, 2)})

    return total.map_batches(finalize, batch_format="pyarrow")


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: for every part, the cheapest supplier by observed
    unit price (correlated MIN subquery → grouped MIN + equality
    join-back; ties broken by smallest supplier key).  Unit price is the
    same float expression on both sides, so min/equality compare
    identically computed doubles."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def unit(b: pa.Table) -> pa.Table:
        return b.append_column(
            "unit", pc.divide(b.column("l_extendedprice"), b.column("l_quantity"))
        )

    li_u = li.map_batches(unit, batch_format="pyarrow")
    m = grouped_agg(li_u, ["l_partkey"], [("mc", "unit", "min")])
    joined = broadcast_join(li_u, m, left_key="l_partkey", columns=["mc"])
    winners = joined.map_batches(
        lambda b: b.filter(pc.equal(b.column("unit"), b.column("mc"))),
        batch_format="pyarrow",
    )
    best = grouped_agg(
        winners,
        ["l_partkey"],
        [("min_cost", "mc", "min"), ("s_suppkey", "l_suppkey", "min")],
        round_to=4,
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = broadcast_join(best, supplier, left_key="s_suppkey", columns=["s_name"])
    return out.map_batches(
        lambda b: b.rename_columns(
            ["p_partkey" if c == "l_partkey" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose revenue exceeds 1.5× the MEAN part
    revenue (HAVING vs a global scalar; the mean-relative cut keeps the
    selectivity stable at every scale, unlike Q11's absolute fraction).
    Money is summed in integer cents so the share comparison
    (``2·cents·n_parts > 3·total``) is exact integer math — immune to
    float summation-order drift between the engine and the oracle."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        cents = pc.cast(
            round_like_duckdb(
                pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0, pa.float64())), 0
            ),
            pa.int64(),
        )
        return pa.table({"l_partkey": b.column("l_partkey"), "cents": cents})

    agg = grouped_agg(
        li.map_batches(to_cents, batch_format="pyarrow"),
        ["l_partkey"],
        [("cents", "cents", "sum")],
        sum_as_float=False,
    ).materialize()  # |parts| rows — tiny relative to the fact table
    total = agg.sum("cents")
    n_parts = agg.count()

    def keep(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        b = b.filter(
            pc.greater(
                pc.multiply(
                    b.column("cents"), pa.scalar(2 * int(n_parts), pa.int64())
                ),
                pa.scalar(3 * int(total), pa.int64()),
            )
        )
        value = round_like_duckdb(
            pc.divide(pc.cast(b.column("cents"), pa.float64()), pa.scalar(100.0, pa.float64())),
            2,
        )
        return pa.table({"p_partkey": b.column("l_partkey"), "part_value": value})

    return agg.map_batches(keep, batch_format="pyarrow")


def q_top_revenue_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with MAX revenue in a quarter —
    aggregate → global max scalar → equality filter (rounded to cents on
    both sides so the equality is on identical doubles)."""
    import numpy as np

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi),
        )
        b = b.filter(keep)
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table({"s_suppkey": b.column("l_suppkey"), "rev": rev})

    agg = grouped_agg(
        li.map_batches(prep, batch_format="pyarrow"),
        ["s_suppkey"],
        [("total_revenue", "rev", "sum")],
        round_to=2,
    ).materialize()  # |suppliers| rows
    best = agg.max("total_revenue")
    top = agg.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_revenue"), pa.scalar(best, pa.float64()))),
        batch_format="pyarrow",
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return broadcast_join(top, supplier, left_key="s_suppkey", columns=["s_name"])


def q_linestatus_priority_counts(sf_dir: str):
    """TPC-H Q12 shape: per line status, how many lines belong to
    critical-priority orders vs not (CASE-count over a big⋈big join; the
    conditional partial aggregate runs fused inside the join reduce)."""
    import numpy as np

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))
    li = li.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        high = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        t = pa.table(
            {
                "l_linestatus": t.column("l_linestatus"),
                "high": pc.cast(high, pa.int64()),
                "low": pc.cast(pc.invert(high), pa.int64()),
            }
        )
        g = t.group_by("l_linestatus").aggregate([("high", "sum"), ("low", "sum")])
        return g.rename_columns(["l_linestatus", "high", "low"])

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=partial
    )
    return grouped_agg(
        joined,
        ["l_linestatus"],
        [("high_line_count", "high", "sum"), ("low_line_count", "low", "sum")],
        sum_as_float=False,
    )


def q_region_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: cross-border trade volume — revenue shipped from a
    supplier region to a DIFFERENT customer region, by year.  Dimension
    chains (supplier→nation→region, customer→nation→region) ride
    broadcast joins; the fact⋈orders core is the one co-partitioned
    exchange, with the (supp_region ≠ cust_region) predicate and the
    three-key partial aggregate fused into the join reduce."""
    import numpy as np

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    def prep_li(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi),
        )
        b = b.filter(keep)
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "l_year": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "rev": rev,
            }
        )

    li = li.map_batches(prep_li, batch_format="pyarrow")
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li = broadcast_join(li, supplier, left_key="l_suppkey", right_key="s_suppkey",
                        columns=["s_nationkey"])
    li = broadcast_join(li, nation, left_key="s_nationkey", right_key="n_nationkey",
                        columns=["n_regionkey"])
    li = broadcast_join(li, region, left_key="n_regionkey", right_key="r_regionkey",
                        columns=["r_name"])
    li = li.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_year": b.column("l_year"),
                "rev": b.column("rev"),
                "supp_region": b.column("r_name"),
            }
        ),
        batch_format="pyarrow",
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = broadcast_join(orders, customer, left_key="o_custkey", right_key="c_custkey",
                            columns=["c_nationkey"])
    orders = broadcast_join(orders, nation, left_key="c_nationkey", right_key="n_nationkey",
                            columns=["n_regionkey"])
    orders = broadcast_join(orders, region, left_key="n_regionkey", right_key="r_regionkey",
                            columns=["r_name"])
    orders = orders.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "cust_region": b.column("r_name"),
            }
        ),
        batch_format="pyarrow",
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(t.column("supp_region"), t.column("cust_region"))
        )
        g = t.group_by(["supp_region", "cust_region", "l_year"]).aggregate(
            [("rev", "sum")]
        )
        return g.rename_columns(["supp_region", "cust_region", "l_year", "rev"])

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=partial
    )
    return grouped_agg(
        joined,
        ["supp_region", "cust_region", "l_year"],
        [("revenue", "rev", "sum")],
        round_to=2,
    )


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape: per supplier, on how many parts it DOMINATES the
    supply (its shipped quantity exceeds twice the part's average supplier
    share) — a nested aggregate threshold.  The (supplier, part) pair
    aggregate is materialized once and re-aggregated for the per-part
    totals, so lineitem is read once; quantities are whole numbers, so the
    float sums are exact and ``pair_qty · n_supp > 2 · part_qty`` compares
    identically computed doubles on both sides."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity"])
    pair = grouped_agg(
        li, ["l_suppkey", "l_partkey"], [("pair_qty", "l_quantity", "sum")]
    ).materialize()
    part_total = grouped_agg(
        pair,
        ["l_partkey"],
        [("part_qty", "pair_qty", "sum"), ("n_supp", "pair_qty", "count")],
        sum_as_float=False,
    )
    joined = hash_join(pair, part_total, left_key="l_partkey", right_key="l_partkey")
    hot = joined.map_batches(
        lambda b: b.filter(
            pc.greater(
                pc.multiply(
                    b.column("pair_qty"),
                    pc.cast(b.column("n_supp"), pa.float64()),
                ),
                pc.multiply(pa.scalar(2.0, pa.float64()), b.column("part_qty")),
            )
        ),
        batch_format="pyarrow",
    )
    dom = grouped_agg(hot, ["l_suppkey"], [("n_dominated", "l_partkey", "count")])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = broadcast_join(
        dom, supplier, left_key="l_suppkey", right_key="s_suppkey",
        columns=["s_name"],
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "s_suppkey": b.column("l_suppkey"),
                "s_name": b.column("s_name"),
                "n_dominated": b.column("n_dominated"),
            }
        ),
        batch_format="pyarrow",
    )


def _embedding_triangle_counts(pairs):
    """Shared triangle enumeration of the triangle-participation and
    clustering-coefficient queries: compact-forward (u < v < w) wedge
    join (one keyed exchange) + co-partitioned SEMI close against the
    edge set, then per-node participation counts.  ``pairs`` should be
    materialized by the caller (it feeds three projections)."""
    e_uv = pairs.map_batches(
        lambda b: pa.table({"u": b.column("id_a"), "v": b.column("id_b")}),
        batch_format="pyarrow",
    )
    e_vw = pairs.map_batches(
        lambda b: pa.table({"v": b.column("id_a"), "w": b.column("id_b")}),
        batch_format="pyarrow",
    )
    e_uw = pairs.map_batches(
        lambda b: pa.table({"u": b.column("id_a"), "w": b.column("id_b")}),
        batch_format="pyarrow",
    )
    wedges = hash_join(e_uv, e_vw, left_key="v", right_key="v")
    triangles = hash_join(
        wedges, e_uw, left_key=["u", "w"], right_key=["u", "w"],
        how="left semi",
    )

    def explode_nodes(b: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [
                b.column(c).combine_chunks().cast(pa.int64())
                for c in ("u", "v", "w")
            ]
        )
        return pa.table({"vec_id": node})

    nodes = triangles.map_batches(explode_nodes, batch_format="pyarrow")
    return grouped_agg(nodes, ["vec_id"], [("n_triangles", "vec_id", "count")])


def q_embedding_triangles(sf_dir: str):
    """Triangle participation counts on the embedding-similarity graph
    (cosine ≥ 0.25): the clustering-structure diagnostic for a near-dup
    graph.  Edges come from the exact all-pairs kernel; triangles are
    enumerated with the compact-forward ordering (u < v < w) — one keyed
    exchange to build wedges (e1.v = e2.u), one co-partitioned SEMI join
    to close them against the edge set — then a per-node count.  Both
    exchanges are keyed hash exchanges; no driver-side graph."""
    from ..stages.ann import embedding_dup_pairs_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    pairs = embedding_dup_pairs_exact(emb, tau=0.25, round_to=4).materialize()
    return _embedding_triangle_counts(pairs)


QUERIES.update(
    {
        "q_order_price_shape": q_order_price_shape,
        "q_avg_yearly_small_qty": q_avg_yearly_small_qty,
        "q_min_cost_supplier": q_min_cost_supplier,
        "q_important_parts": q_important_parts,
        "q_top_revenue_supplier": q_top_revenue_supplier,
        "q_linestatus_priority_counts": q_linestatus_priority_counts,
        "q_region_trade_volume": q_region_trade_volume,
        "q_excess_suppliers": q_excess_suppliers,
        "q_embedding_triangles": q_embedding_triangles,
    }
)

ORACLE_SQL.update(
    {
        "q_order_price_shape": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(skewness(o_totalprice), 6) AS price_skew,
                   round(kurtosis(o_totalprice), 6) AS price_kurt
            FROM orders GROUP BY 1
        """,
        "q_avg_yearly_small_qty": """
            WITH b AS (
                SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = 'Brand#13'
            ),
            a AS (SELECT l_partkey, round(avg(l_quantity), 6) AS avg_qty
                  FROM b GROUP BY 1)
            SELECT round(sum(b.l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM b JOIN a USING (l_partkey)
            WHERE b.l_quantity < 0.5 * a.avg_qty
        """,
        "q_min_cost_supplier": """
            WITH u AS (
                SELECT l_partkey, l_suppkey,
                       l_extendedprice / l_quantity AS unit
                FROM lineitem
            ),
            m AS (SELECT l_partkey, min(unit) AS mc FROM u GROUP BY 1),
            w AS (
                SELECT u.l_partkey, min(m.mc) AS mcost,
                       min(u.l_suppkey) AS s_suppkey
                FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.mc
                GROUP BY 1
            )
            SELECT w.l_partkey AS p_partkey, round(w.mcost, 4) AS min_cost,
                   w.s_suppkey, s.s_name
            FROM w JOIN supplier s USING (s_suppkey)
        """,
        "q_important_parts": """
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
                FROM lineitem GROUP BY 1
            )
            SELECT p_partkey, round(cents / 100.0, 2) AS part_value
            FROM v
            WHERE 2 * cents * (SELECT count(*) FROM v)
                  > 3 * (SELECT sum(cents) FROM v)
        """,
        "q_top_revenue_supplier": """
            WITH r AS (
                SELECT l_suppkey AS s_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate <  DATE '1996-04-01'
                GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM r JOIN supplier s USING (s_suppkey)
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM r)
        """,
        "q_linestatus_priority_counts": """
            SELECT l_linestatus,
                   count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                       AS high_line_count,
                   count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate <  DATE '1998-01-01'
            GROUP BY 1
        """,
        "q_region_trade_volume": """
            WITH j AS (
                SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                       CAST(year(l_shipdate) AS BIGINT) AS l_year,
                       l_extendedprice * (1 - l_discount) AS rev
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate <  DATE '1998-01-01'
                  AND r1.r_name <> r2.r_name
            )
            SELECT supp_region, cust_region, l_year,
                   round(sum(rev), 2) AS revenue
            FROM j GROUP BY 1, 2, 3
        """,
        "q_excess_suppliers": """
            WITH pq AS (
                SELECT l_suppkey, l_partkey, sum(l_quantity) AS pair_qty
                FROM lineitem GROUP BY 1, 2
            ),
            pt AS (
                SELECT l_partkey, sum(pair_qty) AS part_qty,
                       count(*) AS n_supp
                FROM pq GROUP BY 1
            ),
            x AS (
                SELECT l_suppkey AS s_suppkey, count(*) AS n_dominated
                FROM pq JOIN pt USING (l_partkey)
                WHERE pair_qty * CAST(n_supp AS DOUBLE) > 2.0 * part_qty
                GROUP BY 1
            )
            SELECT x.s_suppkey, s.s_name, x.n_dominated
            FROM x JOIN supplier s USING (s_suppkey)
        """,
        "q_embedding_triangles": """
            WITH e AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])), 4)
                      >= 0.25
            ),
            t AS (
                SELECT e1.u, e1.v, e2.v AS w
                FROM e e1
                JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            nodes AS (
                SELECT u AS vec_id FROM t
                UNION ALL SELECT v FROM t
                UNION ALL SELECT w FROM t
            )
            SELECT vec_id, count(*) AS n_triangles FROM nodes GROUP BY 1
        """,
    }
)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: global filter-and-sum (shipped in 1996, mid-band
    discount, small quantity) — a pure map-side reduction: the filter and
    the product run per batch, one scalar partial per block reaches the
    driver.  No shuffle at any scale."""
    from ..stages.agg import round_like_duckdb

    li = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def prep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater(b.column("l_discount"), 0.03),
                    pc.less(b.column("l_discount"), 0.07),
                ),
                pc.less(b.column("l_quantity"), 24.0),
            ),
        )
        b = b.filter(mask)
        return pa.table(
            {"disc_rev": pc.multiply(b.column("l_extendedprice"), b.column("l_discount"))}
        )

    total = li.map_batches(prep, batch_format="pyarrow").sum("disc_rev")
    col = (
        pa.array([None], pa.float64())
        if total is None
        else round_like_duckdb(pa.array([float(total)], pa.float64()), 2)
    )
    return pa.table({"revenue": col})


def q8_national_market_share(sf_dir: str):
    """TPC-H Q8 shape: NATION_5's share of ECONOMY-part revenue among ASIA
    customers, per order year.  Both conditional sums are partialed by
    o_year INSIDE the lineitem⋈orders join reduce (``hash_join(post=)``),
    so the exchange after the join carries ≤ |years| rows per partition;
    the ratio is finalized after one tiny merge."""
    from ..stages.agg import round_like_duckdb

    # lineitem side: semi-filter to ECONOMY parts, attach supplier nation
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    econ = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"), "ECONOMY")),
        batch_format="pyarrow",
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = broadcast_join(
        supp, nation, left_key="s_nationkey", right_key="n_nationkey",
        columns=["n_name"],
    ).map_batches(
        lambda b: pa.table(
            {"s_suppkey": b.column("s_suppkey"), "supp_nation": b.column("n_name")}
        ),
        batch_format="pyarrow",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = broadcast_semi(li, econ, left_key="l_partkey", right_key="p_partkey")
    li = broadcast_join(
        li, supp, left_key="l_suppkey", right_key="s_suppkey",
        columns=["supp_nation"],
    )

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev": rev,
                "supp_nation": b.column("supp_nation"),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")

    # orders side: ASIA customers, 1995-1996 window, year extracted map-side
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = broadcast_join(
        cust, nation, left_key="c_nationkey", right_key="n_nationkey",
        columns=["n_regionkey"],
    )
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    cust = broadcast_join(
        cust, region, left_key="n_regionkey", right_key="r_regionkey",
        columns=["r_name"],
    )
    asia = cust.map_batches(
        lambda b: b.filter(pc.equal(b.column("r_name"), "ASIA")).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    olo = pa.scalar(np.datetime64("1995-01-01", "us"))
    ohi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def order_prep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(b.column("o_orderdate"), olo),
            pc.less(b.column("o_orderdate"), ohi),
        )
        b = b.filter(mask)
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_year": pc.year(b.column("o_orderdate")),
            }
        )

    orders = orders.map_batches(order_prep, batch_format="pyarrow")
    orders = broadcast_semi(orders, asia, left_key="o_custkey", right_key="c_custkey")
    orders = orders.map_batches(
        lambda b: b.select(["o_orderkey", "o_year"]), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        # join key (orderkey) != group key (year) → this is a PARTIAL;
        # sums are associative so the tiny per-year merge below finishes it
        tgt = pc.if_else(
            pc.equal(t.column("supp_nation"), "NATION_5"),
            t.column("rev"), pa.scalar(0.0),
        )
        t2 = pa.table(
            {"o_year": t.column("o_year"), "vol_all": t.column("rev"), "vol_tgt": tgt}
        )
        g = t2.group_by("o_year").aggregate([("vol_all", "sum"), ("vol_tgt", "sum")])
        return pa.table(
            {
                "o_year": g.column("o_year"),
                "vol_all": g.column("vol_all_sum"),
                "vol_tgt": g.column("vol_tgt_sum"),
            }
        )

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=partial
    )
    agg = grouped_agg(
        joined, ["o_year"],
        [("sum_all", "vol_all", "sum"), ("sum_tgt", "vol_tgt", "sum")],
    )

    def finalize(b: pa.Table) -> pa.Table:
        share = round_like_duckdb(pc.divide(b.column("sum_tgt"), b.column("sum_all")), 6)
        return pa.table({"o_year": b.column("o_year"), "mkt_share": share})

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES.update(
    {
        "q6_forecast_revenue": q6_forecast_revenue,
        "q8_national_market_share": q8_national_market_share,
    }
)

ORACLE_SQL.update(
    {
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1997-01-01'
              AND l_discount > 0.03 AND l_discount < 0.07
              AND l_quantity < 24
        """,
        "q8_national_market_share": """
            WITH vol AS (
                SELECT extract(year FROM o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount) AS rev,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON n1.n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n1.n_regionkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s_nationkey
                JOIN part ON p_partkey = l_partkey
                WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                  AND o_orderdate >= DATE '1995-01-01'
                  AND o_orderdate < DATE '1997-01-01'
            )
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
                                  ELSE 0 END) / sum(rev), 6) AS mkt_share
            FROM vol GROUP BY o_year
        """,
    }
)


def q_near_dup_doc_groups(sf_dir: str):
    """Fuzzy-dedup clustering, end to end and EXACT: word-3-gram Jaccard
    ≥ 0.8 pairs (prefix-filter self-join — complete, unlike MinHash) →
    distributed connected components (min-label propagation + pointer
    jumping) → per-doc dup group + canonical flag (canonical = the group's
    minimum doc_id, the doc a dedup pass would keep).  The whole pipeline
    is the standard near-dup removal recipe over a training corpus; every
    stage is cluster-side (the only driver reads are the CC convergence
    scalars)."""
    from ..stages.graph import connected_components
    from ..stages.sim import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    comps = connected_components(pairs, src="doc_a", dst="doc_b")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("node"),
                "dup_group": b.column("component"),
                "is_canonical": pc.equal(b.column("node"), b.column("component")),
            }
        )

    return comps.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_near_dup_doc_groups"] = q_near_dup_doc_groups
ORACLE_SQL["q_near_dup_doc_groups"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN range(1, len(t)-1)])
        END AS gs
      FROM toks
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
            / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(root) AS dup_group,
           (node = min(root)) AS is_canonical
    FROM reach GROUP BY node
"""


def q_customer_name_edit1(sf_dir: str):
    """Exact fuzzy self-match: customer-name pairs within edit distance 1
    (SymSpell deletion-neighborhood join — complete, one shuffle of
    variant-hash rows, vectorized prefix/suffix verify).  The entity-
    resolution primitive: near-identical identifiers without an O(n²)
    cross join (the oracle below IS that cross join)."""
    from ..stages.sim import edit1_pairs

    cust = _read(sf_dir, "customer", ["c_name"])
    return edit1_pairs(cust, "c_name")


QUERIES["q_customer_name_edit1"] = q_customer_name_edit1
ORACLE_SQL["q_customer_name_edit1"] = """
    SELECT a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b ON a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q_user_activity_spans(sf_dir: str):
    """Interval coalescing: each event opens a [ts, ts + value minutes)
    interval; overlapping/touching intervals per user merge into activity
    spans (one keyed exchange + per-run vectorized sweep).  The
    availability-window / log-span-union operator."""
    from ..stages.window import coalesce_intervals

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("ts"), pa.int64())
        dur = pc.cast(
            pc.floor(pc.multiply(b.column("value"), pa.scalar(60_000_000.0))),
            pa.int64(),
        )
        return pa.table(
            {"user_id": b.column("user_id"), "s": s, "e": pc.add(s, dur)}
        )

    iv = ev.map_batches(prep, batch_format="pyarrow")
    spans = coalesce_intervals(iv, key="user_id", start="s", end="e")
    return spans.map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id"),
                "span_start_us": b.column("span_start"),
                "span_end_us": b.column("span_end"),
                "n_merged": b.column("n_merged"),
            }
        ),
        batch_format="pyarrow",
    )


QUERIES["q_user_activity_spans"] = q_user_activity_spans
ORACLE_SQL["q_user_activity_spans"] = """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             sum(new) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    )
    SELECT user_id, min(s) AS span_start_us, max(e) AS span_end_us,
           count(*) AS n_merged
    FROM isl GROUP BY user_id, grp
"""


def q_user_daily_spend_dense(sf_dir: str):
    """Time-series densification: per-user daily spend with missing days
    zero-filled between each user's first and last active day — the
    gap-fill step that makes rolling/lag features correct on sparse
    series.  Aggregate to (user, day) first (combiner + one exchange),
    then a vectorized spine scatter on the same partitioning."""
    from ..stages.window import densify_days

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "day": pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
                "value": b.column("value"),
            }
        )

    daily = grouped_agg(
        ev.map_batches(day_of, batch_format="pyarrow"),
        ["user_id", "day"], [("spend", "value", "sum")], round_to=2,
    )
    return densify_days(daily, key="user_id", day="day", value="spend")


QUERIES["q_user_daily_spend_dense"] = q_user_daily_spend_dense
ORACLE_SQL["q_user_daily_spend_dense"] = """
    WITH d AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             round(sum(value), 2) AS spend
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
    spine AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b)
    SELECT s.user_id, s.day, coalesce(d.spend, 0.0) AS spend
    FROM spine s LEFT JOIN d ON d.user_id = s.user_id AND d.day = s.day
"""


def q_orders_quality_report(sf_dir: str):
    """Data-quality gate over orders: expectation rules (not-null, range,
    enum, regex, uniqueness) → one report row per rule.  Every rule except
    ``unique`` is a pure map-side partial count; ``unique`` rides the
    standard hash-exchange aggregate (shuffle = |distinct keys|)."""
    from ..stages.validate import validate_table

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    rules = [
        {"rule": "custkey_not_null", "column": "o_custkey", "kind": "not_null"},
        {"rule": "price_range", "column": "o_totalprice", "kind": "in_range",
         "lo": 0.0, "hi": 450000.0},
        {"rule": "status_enum", "column": "o_orderstatus", "kind": "in_set",
         "values": ["F", "O"]},
        {"rule": "priority_format", "column": "o_orderpriority", "kind": "regex",
         "pattern": "^[1-5]-"},
        {"rule": "orderkey_unique", "column": "o_orderkey", "kind": "unique"},
        {"rule": "custkey_unique", "column": "o_custkey", "kind": "unique"},
    ]
    return validate_table(orders, rules)


QUERIES["q_orders_quality_report"] = q_orders_quality_report
ORACLE_SQL["q_orders_quality_report"] = """
    SELECT 'custkey_not_null' AS rule, 'o_custkey' AS "column",
           count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations,
           count(*) AS n_rows,
           count(*) FILTER (WHERE o_custkey IS NULL) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'price_range', 'o_totalprice',
           count(*) FILTER (WHERE o_totalprice IS NOT NULL
                            AND (o_totalprice < 0.0 OR o_totalprice > 450000.0)),
           count(*),
           count(*) FILTER (WHERE o_totalprice IS NOT NULL
                            AND (o_totalprice < 0.0 OR o_totalprice > 450000.0)) = 0
    FROM orders
    UNION ALL
    SELECT 'status_enum', 'o_orderstatus',
           count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('F', 'O')),
           count(*),
           count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('F', 'O')) = 0
    FROM orders
    UNION ALL
    SELECT 'priority_format', 'o_orderpriority',
           count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority, '^[1-5]-')),
           count(*),
           count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) = 0
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique', 'o_orderkey',
           count(o_orderkey) - count(DISTINCT o_orderkey),
           count(o_orderkey),
           count(o_orderkey) = count(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'custkey_unique', 'o_custkey',
           count(o_custkey) - count(DISTINCT o_custkey),
           count(o_custkey),
           count(o_custkey) = count(DISTINCT o_custkey)
    FROM orders
"""


def q_lineitem_corr_matrix(sf_dir: str):
    """Feature-correlation matrix in one pass: all pairwise Pearson r over
    four lineitem measures from mergeable moments — the exchange carries 6
    rows per block no matter the input size (the EDA screening step before
    feature selection)."""
    from ..stages.agg import corr_matrix

    li = _read(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    return corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


QUERIES["q_lineitem_corr_matrix"] = q_lineitem_corr_matrix
ORACLE_SQL["q_lineitem_corr_matrix"] = """
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_v,
           count(*) AS n_pairs FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6), count(*) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round(corr(l_quantity, l_tax), 6), count(*) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6), count(*) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_tax',
           round(corr(l_extendedprice, l_tax), 6), count(*) FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round(corr(l_discount, l_tax), 6), count(*) FROM lineitem
"""


def q_user_event_entropy(sf_dir: str):
    """Behavioral-diversity profiling: Shannon entropy of each user's
    event-type distribution, computed from mergeable partials only —
    H = ln N − (Σ n·ln n)/N over per-(user, type) counts, so nothing wider
    than two small keyed aggregates ever runs."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = grouped_agg(
        ev, ["user_id", "event_type"], [("n", "event_type", "count")]
    )

    def prep(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n": n,
                "nlogn": pc.multiply(n, pc.ln(n)),
            }
        )

    partials = counts.map_batches(prep, batch_format="pyarrow")
    agg = grouped_agg(
        partials, ["user_id"], [("total", "n", "sum"), ("s_nlogn", "nlogn", "sum")]
    )

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        total = b.column("total")
        h = pc.subtract(
            pc.ln(total), pc.divide(b.column("s_nlogn"), total)
        )
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n_events": pc.cast(total, pa.int64()),
                "entropy": round_like_duckdb(h, 6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_event_entropy"] = q_user_event_entropy
ORACLE_SQL["q_user_event_entropy"] = """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY user_id, event_type
    ),
    s AS (
      SELECT user_id, sum(n) AS total, sum(n * ln(n)) AS s_nlogn
      FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(total AS BIGINT) AS n_events,
           round(ln(total) - s_nlogn / total, 6) AS entropy
    FROM s
"""


def q_referential_integrity(sf_dir: str):
    """Cross-table referential-integrity report: FK orphan counts for
    orders→customer (dimension-sized ref → broadcast anti, zero shuffle)
    and lineitem→orders (fact-sized ref → co-partitioned LEFT ANTI hash
    join), plus an intentionally-violated check (orders→high-value
    customers) so the fail branch is exercised."""
    from ..stages.validate import validate_foreign_key

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    r1 = validate_foreign_key(
        orders, rule="orders_custkey_fk", column="o_custkey",
        ref_ds=cust, ref_column="c_custkey",
    )
    r2 = validate_foreign_key(
        li, rule="lineitem_orderkey_fk", column="l_orderkey",
        ref_ds=orders, ref_column="o_orderkey", broadcast=False,
    )
    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"), 5000.0)),
        batch_format="pyarrow",
    )
    r3 = validate_foreign_key(
        orders, rule="orders_rich_customer_fk", column="o_custkey",
        ref_ds=rich, ref_column="c_custkey",
    )
    return r1.union(r2).union(r3)


QUERIES["q_referential_integrity"] = q_referential_integrity
ORACLE_SQL["q_referential_integrity"] = """
    SELECT 'orders_custkey_fk' AS rule, 'o_custkey' AS "column",
           count(*) FILTER (WHERE c_custkey IS NULL) AS n_violations,
           count(*) AS n_rows,
           count(*) FILTER (WHERE c_custkey IS NULL) = 0 AS passed
    FROM orders LEFT JOIN customer ON c_custkey = o_custkey
    WHERE o_custkey IS NOT NULL
    UNION ALL
    SELECT 'lineitem_orderkey_fk', 'l_orderkey',
           count(*) FILTER (WHERE o_orderkey IS NULL),
           count(*),
           count(*) FILTER (WHERE o_orderkey IS NULL) = 0
    FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey
    WHERE l_orderkey IS NOT NULL
    UNION ALL
    SELECT 'orders_rich_customer_fk', 'o_custkey',
           count(*) FILTER (WHERE r.c_custkey IS NULL),
           count(*),
           count(*) FILTER (WHERE r.c_custkey IS NULL) = 0
    FROM orders LEFT JOIN (SELECT c_custkey FROM customer
                           WHERE c_acctbal > 5000.0) r
         ON r.c_custkey = o_custkey
    WHERE o_custkey IS NOT NULL
"""


def q_incremental_event_stats(sf_dir: str):
    """Incremental materialized-view maintenance: aggregate STATE (mergeable
    moments per event type) built from history (ts < Jan 16), then the new
    fortnight folded in via one state merge — cost O(|state| + |delta
    groups|), NO rescan of history.  Must equal (and the oracle IS) the
    full-table aggregate."""
    from ..stages.agg import agg_state, finalize_agg_state, merge_agg_state

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    cutoff = pa.scalar(np.datetime64("2024-01-16", "us"))
    base = ev.map_batches(
        lambda b: b.filter(pc.less(b.column("ts"), cutoff)),
        batch_format="pyarrow",
    )
    delta = ev.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("ts"), cutoff)),
        batch_format="pyarrow",
    )
    specs = [
        ("n_events", "value", "count"),
        ("sum_value", "value", "sum"),
        ("avg_value", "value", "mean"),
        ("min_value", "value", "min"),
        ("max_value", "value", "max"),
        ("std_value", "value", "std"),
    ]
    state = agg_state(base, ["event_type"], specs)
    merged = merge_agg_state([state], ["event_type"], specs, deltas=[delta])
    return finalize_agg_state(merged, ["event_type"], specs, round_to=6)


QUERIES["q_incremental_event_stats"] = q_incremental_event_stats
ORACLE_SQL["q_incremental_event_stats"] = """
    SELECT event_type,
           count(value) AS n_events,
           round(sum(value), 6) AS sum_value,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(stddev_samp(value), 6) AS std_value
    FROM events GROUP BY event_type
"""


def _basket_pair_counts(sf_dir: str):
    """Distinct same-order part pairs with co-occurrence counts — the
    market-basket building block shared by the co-purchase top-k and the
    item-item cosine queries.  Pairs are generated inside the order's own
    co-partition run (≤ items² per order, never a global self-join); the
    pair counts ride the standard combiner exchange."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    empty = pa.table(
        {"part_a": pa.array([], pa.int64()), "part_b": pa.array([], pa.int64())}
    )

    def pairs_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("l_orderkey", "ascending"), ("l_partkey", "ascending")])
        db = _key_run_bounds(t, ["l_orderkey", "l_partkey"])
        mask = np.zeros(t.num_rows, bool)
        mask[db[:-1]] = True
        t = t.filter(pa.array(mask))  # distinct (order, part)
        bounds = _key_run_bounds(t, ["l_orderkey"])
        sizes = np.diff(bounds)
        parts = t.column("l_partkey").to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        for ri in np.flatnonzero(sizes >= 2):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            ii, jj = np.triu_indices(e - s, k=1)
            a_out.append(parts[s:e][ii])
            b_out.append(parts[s:e][jj])
        if not a_out:
            return empty
        return pa.table(
            {
                "part_a": pa.array(np.concatenate(a_out), pa.int64()),
                "part_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    pairs = grouped_map(
        li, "l_orderkey", pairs_part, per_group=False,
        empty_schema=pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
            }
        ),
    )
    counts = grouped_agg(
        pairs, ["part_a", "part_b"], [("n_orders", "part_a", "count")],
        sum_as_float=False,
    )
    counts = counts.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_orders"),
            "n_orders", pc.cast(b.column("n_orders"), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    return counts


def q_copurchase_part_pairs(sf_dir: str):
    """Market-basket co-occurrence (bipartite projection): part pairs that
    ship in the same order, counted across orders, top-20 — the pair
    stream from :func:`_basket_pair_counts` cut by local-top-k + one tiny
    global merge."""
    from ..stages.agg import global_topk

    return global_topk(
        _basket_pair_counts(sf_dir), ["n_orders", "part_a", "part_b"], 20,
        descending=[True, False, False],
    )


def q_event_type_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's event stream
    (src type → next type): consecutive pairs are read off inside the
    per-user run (one keyed exchange, vectorized shift), then a tiny
    (src, dst) count exchange — the sequence-mining building block."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    empty = pa.table(
        {"src_type": pa.array([], pa.string()), "dst_type": pa.array([], pa.string())}
    )

    def trans_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        bounds = _key_run_bounds(t, ["user_id"])
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        keep = np.ones(t.num_rows, bool)
        keep[bounds[:-1]] = False  # a run's first event has no predecessor
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        return pa.table(
            {
                "src_type": pa.array(types[idx - 1], pa.string()),
                "dst_type": pa.array(types[idx], pa.string()),
            }
        )

    pairs = grouped_map(
        ev, "user_id", trans_part, per_group=False,
        empty_schema=pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
            }
        ),
    )
    counts = grouped_agg(
        pairs, ["src_type", "dst_type"],
        [("n_transitions", "src_type", "count")], sum_as_float=False,
    )
    return counts.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_transitions"),
            "n_transitions", pc.cast(b.column("n_transitions"), pa.int64()),
        ),
        batch_format="pyarrow",
    )


QUERIES.update(
    {
        "q_copurchase_part_pairs": q_copurchase_part_pairs,
        "q_event_type_transitions": q_event_type_transitions,
    }
)

ORACLE_SQL.update(
    {
        "q_copurchase_part_pairs": """
            WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            p AS (
              SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
              FROM d a JOIN d b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            )
            SELECT part_a, part_b, count(*) AS n_orders
            FROM p GROUP BY 1, 2
            ORDER BY n_orders DESC, part_a, part_b
            LIMIT 20
        """,
        "q_event_type_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT prev AS src_type, event_type AS dst_type,
                   count(*) AS n_transitions
            FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
    }
)


def q_weekly_retention_cohorts(sf_dir: str):
    """Retention cohort analysis: users grouped by first-activity week
    (cohort), then distinct active users per (cohort week, week offset) —
    the product-analytics staple.  First-activity is a keyed MIN aggregate;
    the cohort map broadcasts back over the stream (users ≪ events); the
    retention cells are one composite exact count-distinct."""
    from ..stages.agg import grouped_count_distinct

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def week_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        week = pc.divide(us, pa.scalar(604_800_000_000, pa.int64()))
        return pa.table({"user_id": b.column("user_id"), "week": week})

    weeks = ev.map_batches(week_of, batch_format="pyarrow")
    first = grouped_agg(weeks, ["user_id"], [("cohort_week", "week", "min")])
    withc = broadcast_join(
        weeks, first, left_key="user_id", right_key="user_id",
        columns=["cohort_week"],
    )

    def offset(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": b.column("cohort_week"),
                "week_offset": pc.subtract(b.column("week"), b.column("cohort_week")),
                "user_id": b.column("user_id"),
            }
        )

    cells = withc.map_batches(offset, batch_format="pyarrow")
    return grouped_count_distinct(
        cells, ["cohort_week", "week_offset"], "user_id", out_name="n_users"
    )


QUERIES["q_weekly_retention_cohorts"] = q_weekly_retention_cohorts
ORACLE_SQL["q_weekly_retention_cohorts"] = """
    WITH w AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
      FROM events
    ),
    f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
    SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
           count(DISTINCT w.user_id) AS n_users
    FROM w JOIN f ON w.user_id = f.user_id
    GROUP BY 1, 2
"""


def q_image_features_real(sf_dir: str):
    """REAL multimodal pipeline (no stubs): synth PPM images → actor-pool
    decode (pure-numpy P6 parse) → nearest resize → per-image feature
    vectors.  Rows-only check (no SQL can decode images); the kernel is
    pinned exactly by `test_ppm_real_image_path`."""
    import ray

    from ..stages.multimodal import PPMImageStage, synth_ppm_table

    media = ray.data.from_arrow(synth_ppm_table(96))
    return media.map_batches(
        PPMImageStage, concurrency=2, batch_size=16, batch_format="pyarrow"
    )


QUERIES["q_image_features_real"] = q_image_features_real


def q_audio_features_real(sf_dir: str):
    """REAL audio pipeline: synth WAV clips → actor-pool PCM16 decode →
    RMS/ZCR/centroid/band features.  Rows-only (no SQL audio decode);
    kernel pinned by `test_wav_and_rawvideo_real_paths`."""
    import ray

    from ..stages.multimodal import WavAudioStage, synth_wav_table

    return ray.data.from_arrow(synth_wav_table(64)).map_batches(
        WavAudioStage, concurrency=2, batch_size=16, batch_format="pyarrow"
    )


def q_video_frame_features_real(sf_dir: str):
    """REAL video pipeline: raw RGB clips → uniform frame sampling →
    per-frame image features (1 clip explodes to n_frames rows).
    Rows-only; kernel pinned by `test_wav_and_rawvideo_real_paths`."""
    import ray

    from ..stages.multimodal import RawVideoFrameStage, synth_rawvideo_table

    return ray.data.from_arrow(synth_rawvideo_table(16)).map_batches(
        RawVideoFrameStage, concurrency=2, batch_size=8, batch_format="pyarrow"
    )


QUERIES.update(
    {
        "q_audio_features_real": q_audio_features_real,
        "q_video_frame_features_real": q_video_frame_features_real,
    }
)


def q_weighted_avg_discount(sf_dir: str):
    """Quantity-weighted average discount per return flag: the ``wmean``
    grouped_agg kind (col = (x, w) pair) — Σ(x·w)/Σw from the same
    mergeable pair moments the corr family uses, one combiner exchange."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_quantity"])
    return grouped_agg(
        li, ["l_returnflag"],
        [
            ("w_avg_discount", ("l_discount", "l_quantity"), "wmean"),
            ("plain_avg_discount", "l_discount", "mean"),
        ],
        round_to=6,
    )


QUERIES["q_weighted_avg_discount"] = q_weighted_avg_discount
ORACLE_SQL["q_weighted_avg_discount"] = """
    SELECT l_returnflag,
           round(sum(l_discount * l_quantity) / sum(l_quantity), 6)
               AS w_avg_discount,
           round(avg(l_discount), 6) AS plain_avg_discount
    FROM lineitem GROUP BY l_returnflag
"""


def q_doc_keywords(sf_dir: str):
    """Keyword extraction: top-3 TF-IDF terms PER DOCUMENT (tf/df join +
    per-group top-k with deterministic tiebreak) — the feature-tagging
    step of a corpus pipeline; the per-doc cut happens map-side so the
    exchange carries ≤ 3·|docs| rows."""
    import math

    from ..stages.agg import grouped_topk, round_like_duckdb

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def toks(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        ids = pc.list_parent_indices(split)
        return pa.table(
            {
                "doc_id": b.column("doc_id").take(ids),
                "token": pc.list_flatten(split),
            }
        )

    exploded = docs.map_batches(toks, batch_format="pyarrow")
    tf = grouped_agg(exploded, ["doc_id", "token"], [("tf", "token", "count")])
    df = grouped_agg(tf, ["token"], [("df", "token", "count")])
    joined = hash_join(tf, df, left_key="token", num_partitions=8)

    def tfidf(b: pa.Table) -> pa.Table:
        idf = pc.ln(
            pc.divide(pa.scalar(float(n_docs)), pc.cast(b.column("df"), pa.float64()))
        )
        v = pc.multiply(pc.cast(b.column("tf"), pa.float64()), idf)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "token": b.column("token"),
                "tfidf": round_like_duckdb(v, 6),
            }
        )

    scored = joined.map_batches(tfidf, batch_format="pyarrow")
    return grouped_topk(scored, ["doc_id"], "tfidf", 3, tiebreak=["token"])


QUERIES["q_doc_keywords"] = q_doc_keywords
ORACLE_SQL["q_doc_keywords"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS cnt FROM documents),
    scored AS (
        SELECT doc_id, token,
               round(tf * ln((SELECT cnt FROM n) / CAST(df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, tfidf FROM (
        SELECT doc_id, token, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        FROM scored)
    WHERE rn <= 3
"""


def q_order_global_rank(sf_dir: str):
    """Distributed global ranking: every order's exact rank by total price
    (range_sort — block order = global order — then per-block offset id
    assignment; the driver only ever sees O(blocks) counts).  The
    cluster-wide ``row_number() OVER (ORDER BY ...)`` primitive."""
    from ..stages.sort import global_row_numbers, range_sort

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    srt = range_sort(
        orders, "o_totalprice", descending=True, tiebreak=["o_orderkey"]
    )
    return global_row_numbers(srt)


QUERIES["q_order_global_rank"] = q_order_global_rank
ORACLE_SQL["q_order_global_rank"] = """
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
"""


def q_embedding_pca(sf_dir: str):
    """Dimensionality reduction for the embedding table: one-pass
    distributed PCA fit (mergeable second-moment partials, driver does only
    the p×p eigh) + broadcast projection to 8 dims.  Rows-only (no SQL
    eigendecomposition); the math is pinned == numpy by
    `test_pca_matches_numpy`."""
    import ray

    from ..stages.ann import pca_fit, pca_transform

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    model = pca_fit(emb, 8)
    return pca_transform(emb, model)


QUERIES["q_embedding_pca"] = q_embedding_pca


def q_dau_mau_stickiness(sf_dir: str):
    """DAU / trailing-28-day MAU / stickiness per day.  The trailing
    DISTINCT is made tractable the hopping-window way: each distinct
    (user, day) pair explodes map-side into the ≤28 window-end days it is
    visible to (numpy repeat — never a range self-join), the window days
    are semi-filtered to observed days (tiny broadcast), and one composite
    exact count-distinct finishes MAU."""
    from ..stages.agg import grouped_count_distinct

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "day": pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
            }
        )

    pairs = grouped_agg(
        ev.map_batches(day_of, batch_format="pyarrow"),
        ["user_id", "day"], [("n", "day", "count")],
    ).map_batches(lambda b: b.drop_columns(["n"]), batch_format="pyarrow")

    dau = grouped_agg(pairs, ["day"], [("dau", "day", "count")], sum_as_float=False)
    days = dau.map_batches(lambda b: b.select(["day"]), batch_format="pyarrow")

    def explode_windows(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        d = b.column("day").to_numpy(zero_copy_only=False)
        reps = np.full(len(d), 28, np.int64)
        w = np.repeat(d, reps) + np.tile(np.arange(28, dtype=np.int64), len(d))
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, reps)),
                "wday": pa.array(w),
            }
        )

    cells = pairs.map_batches(explode_windows, batch_format="pyarrow")
    cells = broadcast_semi(cells, days, left_key="wday", right_key="day")
    mau = grouped_count_distinct(cells, ["wday"], "user_id", out_name="mau")

    joined = broadcast_join(dau, mau, left_key="day", right_key="wday", columns=["mau"])

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        dau_f = pc.cast(b.column("dau"), pa.float64())
        mau_f = pc.cast(b.column("mau"), pa.float64())
        return pa.table(
            {
                "day": b.column("day"),
                "dau": pc.cast(b.column("dau"), pa.int64()),
                "mau": pc.cast(b.column("mau"), pa.int64()),
                "stickiness": round_like_duckdb(pc.divide(dau_f, mau_f), 6),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_dau_mau_stickiness"] = q_dau_mau_stickiness
ORACLE_SQL["q_dau_mau_stickiness"] = """
    WITH pairs AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
    mau AS (
      SELECT d.day, count(DISTINCT p.user_id) AS mau
      FROM (SELECT DISTINCT day FROM pairs) d
      JOIN pairs p ON p.day BETWEEN d.day - 27 AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON mau.day = dau.day
"""


def q_supplier_degree_distribution(sf_dir: str):
    """Graph degree distribution: distinct parts per supplier (degree),
    then supplier count per degree — the count-of-counts shape over the
    bipartite supply graph (two mergeable aggregates, no join)."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = grouped_agg(
        li, ["l_suppkey", "l_partkey"], [("n", "l_partkey", "count")]
    )
    degree = grouped_agg(
        edges, ["l_suppkey"], [("degree", "l_suppkey", "count")], sum_as_float=False
    )
    dist = grouped_agg(
        degree, ["degree"], [("n_suppliers", "degree", "count")], sum_as_float=False
    )
    return dist.map_batches(
        lambda b: pa.table(
            {
                "degree": pc.cast(b.column("degree"), pa.int64()),
                "n_suppliers": pc.cast(b.column("n_suppliers"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_user_click_purchase_overlap(sf_dir: str):
    """Behavioral-overlap Jaccard per user: |click days ∩ purchase days| /
    |click days ∪ purchase days| from ONE pass of conditional flags — the
    set-similarity-between-two-behaviors shape without any set explode."""
    from ..stages.agg import round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("event_type"), value_set=pa.array(["click", "purchase"])))
        us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        is_c = pc.cast(pc.equal(b.column("event_type"), "click"), pa.int64())
        is_p = pc.cast(pc.equal(b.column("event_type"), "purchase"), pa.int64())
        return pa.table(
            {"user_id": b.column("user_id"), "day": day, "c": is_c, "p": is_p}
        )

    flags = ev.map_batches(prep, batch_format="pyarrow")
    per_day = grouped_agg(
        flags, ["user_id", "day"], [("has_c", "c", "max"), ("has_p", "p", "max")]
    )

    def both(b: pa.Table) -> pa.Table:
        inter = pc.multiply(b.column("has_c"), b.column("has_p"))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "c_day": b.column("has_c"),
                "p_day": b.column("has_p"),
                "both_day": inter,
            }
        )

    days = per_day.map_batches(both, batch_format="pyarrow")
    agg = grouped_agg(
        days, ["user_id"],
        [("n_click_days", "c_day", "sum"), ("n_purchase_days", "p_day", "sum"),
         ("n_both_days", "both_day", "sum")],
        sum_as_float=False,
    )

    def finalize(b: pa.Table) -> pa.Table:
        nc = pc.cast(b.column("n_click_days"), pa.float64())
        np_ = pc.cast(b.column("n_purchase_days"), pa.float64())
        ni = pc.cast(b.column("n_both_days"), pa.float64())
        union = pc.subtract(pc.add(nc, np_), ni)
        ok = pc.greater(union, pa.scalar(0.0))
        j = pc.divide(ni, pc.if_else(ok, union, pa.scalar(1.0)))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n_click_days": pc.cast(b.column("n_click_days"), pa.int64()),
                "n_purchase_days": pc.cast(b.column("n_purchase_days"), pa.int64()),
                "n_both_days": pc.cast(b.column("n_both_days"), pa.int64()),
                "day_jaccard": round_like_duckdb(
                    pc.if_else(ok, j, pa.scalar(None, pa.float64())), 6
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES.update(
    {
        "q_supplier_degree_distribution": q_supplier_degree_distribution,
        "q_user_click_purchase_overlap": q_user_click_purchase_overlap,
    }
)

ORACLE_SQL.update(
    {
        "q_supplier_degree_distribution": """
            WITH deg AS (
              SELECT l_suppkey, count(DISTINCT l_partkey) AS degree
              FROM lineitem GROUP BY l_suppkey
            )
            SELECT degree, count(*) AS n_suppliers FROM deg GROUP BY degree
        """,
        "q_user_click_purchase_overlap": """
            WITH d AS (
              SELECT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                     max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
              FROM events
              WHERE event_type IN ('click', 'purchase')
              GROUP BY 1, 2
            )
            SELECT user_id,
                   sum(c) AS n_click_days,
                   sum(p) AS n_purchase_days,
                   sum(c * p) AS n_both_days,
                   round(CAST(sum(c * p) AS DOUBLE)
                         / (sum(c) + sum(p) - sum(c * p)), 6) AS day_jaccard
            FROM d GROUP BY user_id
        """,
    }
)


def q_union_by_name_events(sf_dir: str):
    """Schema-evolution union: two projections of events with different
    column sets unioned BY NAME (missing columns → NULL) then aggregated —
    the evolving-parquet ingest shape, zero shuffle for the align step."""
    from ..stages.setops import union_by_name

    old_shape = _read(sf_dir, "events", ["user_id", "value"])
    new_shape = _read(sf_dir, "events", ["user_id", "event_type"])
    u = union_by_name([old_shape, new_shape])

    def flags(b: pa.Table) -> pa.Table:
        # grouped_agg "count" is count(*); SQL count(col) needs validity flags
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "value": b.column("value"),
                "has_value": pc.cast(pc.is_valid(b.column("value")), pa.int64()),
                "has_type": pc.cast(pc.is_valid(b.column("event_type")), pa.int64()),
            }
        )

    return grouped_agg(
        u.map_batches(flags, batch_format="pyarrow"), ["user_id"],
        [
            ("n_rows", "user_id", "count"),
            ("n_values", "has_value", "sum"),
            ("n_types", "has_type", "sum"),
            ("sum_value", "value", "sum"),
        ],
        round_to=2, sum_as_float=True,
    ).map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id"),
                "n_rows": pc.cast(b.column("n_rows"), pa.int64()),
                "n_values": pc.cast(b.column("n_values"), pa.int64()),
                "n_types": pc.cast(b.column("n_types"), pa.int64()),
                "sum_value": b.column("sum_value"),
            }
        ),
        batch_format="pyarrow",
    )


def q_hot_users_report(sf_dir: str):
    """Skew diagnostics: the 10 hottest keys and their share of all rows —
    what you run BEFORE choosing a partitioning key (exact count +
    deterministic top-k; the streaming swap is `approx_heavy_hitters`)."""
    from ..stages.agg import global_topk, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id"])
    total = ev.count()
    counts = grouped_agg(
        ev, ["user_id"], [("n_events", "user_id", "count")], sum_as_float=False
    )
    counts = counts.map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("user_id"),
                "n_events": pc.cast(b.column("n_events"), pa.int64()),
                "share": round_like_duckdb(
                    pc.divide(
                        pc.cast(b.column("n_events"), pa.float64()),
                        pa.scalar(float(total)),
                    ),
                    6,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return global_topk(counts, ["n_events", "user_id"], 10, descending=[True, False])


QUERIES.update(
    {
        "q_union_by_name_events": q_union_by_name_events,
        "q_hot_users_report": q_hot_users_report,
    }
)

ORACLE_SQL.update(
    {
        "q_union_by_name_events": """
            WITH u AS (
              SELECT user_id, value, NULL AS event_type FROM events
              UNION ALL
              SELECT user_id, NULL AS value, event_type FROM events
            )
            SELECT user_id, count(*) AS n_rows, count(value) AS n_values,
                   count(event_type) AS n_types,
                   round(sum(value), 2) AS sum_value
            FROM u GROUP BY user_id
        """,
        "q_hot_users_report": """
            SELECT user_id, count(*) AS n_events,
                   round(count(*) / CAST((SELECT count(*) FROM events) AS DOUBLE),
                         6) AS share
            FROM events GROUP BY user_id
            ORDER BY n_events DESC, user_id LIMIT 10
        """,
    }
)


def q_order_amount_reconciliation(sf_dir: str):
    """Cross-table reconciliation audit: each order's header total vs the
    sum of its line revenues — the 20 largest absolute discrepancies.
    The per-order line sum is FINAL inside the lineitem⋈orders join reduce
    (join key == group key → ``hash_join(post=)``), so the full join
    output never re-exchanges; top-k cuts map-side."""
    from ..stages.agg import global_topk, round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def reconcile(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "o_totalprice"]).aggregate([("rev", "sum")])
        line_total = round_like_duckdb(g.column("rev_sum"), 2)
        delta = round_like_duckdb(
            pc.abs(pc.subtract(g.column("o_totalprice"), g.column("rev_sum"))), 2
        )
        return pa.table(
            {
                "o_orderkey": g.column("l_orderkey"),
                "o_totalprice": g.column("o_totalprice"),
                "line_total": line_total,
                "abs_delta": delta,
            }
        )

    joined = hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey", post=reconcile
    )
    return global_topk(joined, ["abs_delta", "o_orderkey"], 20, descending=[True, False])


QUERIES["q_order_amount_reconciliation"] = q_order_amount_reconciliation
ORACLE_SQL["q_order_amount_reconciliation"] = """
    SELECT o_orderkey, o_totalprice,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS line_total,
           round(abs(o_totalprice - sum(l_extendedprice * (1 - l_discount))), 2)
               AS abs_delta
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    ORDER BY abs_delta DESC, o_orderkey
    LIMIT 20
"""


def q_split_contamination(sf_dir: str):
    """Eval-hygiene check: duplicate TEXTS that straddle train/val/test
    (splits hash doc_id, so byte-identical texts can cross the boundary —
    exactly the leakage a benchmark must not have).  Texts are keyed by
    sha256 map-side (long strings never enter the exchange); two keyed
    aggregates + a co-partitioned join; the 3-number report folds from
    per-block partials on the driver."""
    import hashlib

    from ..stages.agg import grouped_count_distinct
    from ..stages.sample import deterministic_split

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tagged = deterministic_split(docs, id_col="doc_id", splits=_SPLITS, seed="r1")

    def key(b: pa.Table) -> pa.Table:
        fps = [
            hashlib.sha256((t or "").encode()).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        return pa.table({"fp": pa.array(fps, pa.string()), "split": b.column("split")})

    keyed = tagged.map_batches(key, batch_format="pyarrow")
    n_docs = grouped_agg(keyed, ["fp"], [("n_docs", "fp", "count")], sum_as_float=False)
    n_splits = grouped_count_distinct(keyed, ["fp"], "split", out_name="n_splits")
    per_text = hash_join(n_docs, n_splits, left_key="fp", right_key="fp")

    def partial(b: pa.Table) -> pa.Table:
        contaminated = pc.greater(b.column("n_splits"), pa.scalar(1, pa.int64()))
        nd = pc.cast(b.column("n_docs"), pa.int64())
        return pa.table(
            {
                "n_distinct_texts": pa.array([b.num_rows], pa.int64()),
                "n_contaminated_texts": pa.array(
                    [pc.sum(pc.cast(contaminated, pa.int64())).as_py() or 0], pa.int64()
                ),
                "n_docs_affected": pa.array(
                    [
                        pc.sum(
                            pc.if_else(contaminated, nd, pa.scalar(0, pa.int64()))
                        ).as_py()
                        or 0
                    ],
                    pa.int64(),
                ),
            }
        )

    rows = per_text.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "n_distinct_texts": pa.array(
                [sum(r["n_distinct_texts"] for r in rows)], pa.int64()
            ),
            "n_contaminated_texts": pa.array(
                [sum(r["n_contaminated_texts"] for r in rows)], pa.int64()
            ),
            "n_docs_affected": pa.array(
                [sum(r["n_docs_affected"] for r in rows)], pa.int64()
            ),
        }
    )


QUERIES["q_split_contamination"] = q_split_contamination


def _split_contamination_sql() -> str:
    from ..stages.sample import sql_split_case

    case = sql_split_case("doc_id", _SPLITS, seed="r1")
    return f"""
        WITH s AS (SELECT doc_id, text, {case} AS split FROM documents),
        g AS (
          SELECT text, count(DISTINCT split) AS n_splits, count(*) AS n_docs
          FROM s GROUP BY text
        )
        SELECT count(*) AS n_distinct_texts,
               count(*) FILTER (WHERE n_splits > 1) AS n_contaminated_texts,
               coalesce(sum(n_docs) FILTER (WHERE n_splits > 1), 0)
                   AS n_docs_affected
        FROM g
    """


ORACLE_SQL["q_split_contamination"] = _split_contamination_sql()


def q_events_value_winsorized(sf_dir: str):
    """Winsorized robust statistics per event type: clip values to the
    exact [p05, p95] group band (quantiles broadcast back, vectorized
    clamp), then re-aggregate — the outlier-robust preprocessing step
    before any mean-based feature."""
    from ..stages.agg import grouped_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    q = grouped_quantiles(
        ev, "event_type", "value", [("p05", 0.05), ("p95", 0.95)], round_to=6
    )
    joined = broadcast_join(ev, q, left_key="event_type", columns=["p05", "p95"])

    def clip(b: pa.Table) -> pa.Table:
        w = pc.min_element_wise(
            pc.max_element_wise(b.column("value"), b.column("p05")),
            b.column("p95"),
        )
        return pa.table({"event_type": b.column("event_type"), "w": w})

    clipped = joined.map_batches(clip, batch_format="pyarrow")
    return grouped_agg(
        clipped, ["event_type"],
        [
            ("n_events", "w", "count"),
            ("w_mean", "w", "mean"),
            ("w_std", "w", "std"),
        ],
        round_to=4,
    )


QUERIES["q_events_value_winsorized"] = q_events_value_winsorized
ORACLE_SQL["q_events_value_winsorized"] = """
    WITH q AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS p05,
             round(quantile_cont(value, 0.95), 6) AS p95
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT e.event_type, least(greatest(e.value, q.p05), q.p95) AS w
      FROM events e JOIN q USING (event_type)
    )
    SELECT event_type, count(*) AS n_events,
           round(avg(w), 4) AS w_mean,
           round(stddev_samp(w), 4) AS w_std
    FROM c GROUP BY event_type
"""


def q_priority_share_within_status(sf_dir: str):
    """Hierarchical share report (percent-of-parent): order counts per
    (status, priority) AND per status from ONE grouping-sets pass over the
    data, then each leaf cell's share of its parent subtotal via a
    broadcast of the tiny parent level — the drill-down table every BI
    rollup renders."""
    from ..stages.agg import grouped_agg_sets, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    sets = grouped_agg_sets(
        orders, ["o_orderstatus", "o_orderpriority"],
        [("n_orders", "o_orderstatus", "count")],
        sets=[["o_orderstatus", "o_orderpriority"], ["o_orderstatus"]],
        sum_as_float=False, grouping_id="gid",
    )
    leaves = sets.map_batches(
        lambda b: b.filter(pc.equal(b.column("gid"), 0)).drop_columns(["gid"]),
        batch_format="pyarrow",
    )
    parents = sets.map_batches(
        lambda b: pa.table(
            {
                "o_orderstatus": b.filter(pc.equal(b.column("gid"), 1)).column(
                    "o_orderstatus"
                ),
                "status_total": b.filter(pc.equal(b.column("gid"), 1)).column(
                    "n_orders"
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_join(
        leaves, parents, left_key="o_orderstatus", right_key="o_orderstatus",
        columns=["status_total"],
    )

    def finalize(b: pa.Table) -> pa.Table:
        share = round_like_duckdb(
            pc.divide(
                pc.cast(b.column("n_orders"), pa.float64()),
                pc.cast(b.column("status_total"), pa.float64()),
            ),
            6,
        )
        return pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "o_orderpriority": b.column("o_orderpriority"),
                "n_orders": pc.cast(b.column("n_orders"), pa.int64()),
                "status_total": pc.cast(b.column("status_total"), pa.int64()),
                "share_of_status": share,
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_priority_share_within_status"] = q_priority_share_within_status
ORACLE_SQL["q_priority_share_within_status"] = """
    WITH leaf AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    parent AS (
      SELECT o_orderstatus, count(*) AS status_total FROM orders GROUP BY 1
    )
    SELECT l.o_orderstatus, l.o_orderpriority, l.n_orders, p.status_total,
           round(CAST(l.n_orders AS DOUBLE) / p.status_total, 6)
               AS share_of_status
    FROM leaf l JOIN parent p USING (o_orderstatus)
"""


def q_events_value_interp(sf_dir: str):
    """Time-weighted linear interpolation of missing sensor values per
    user (values on 'error' events treated as missing): gaps fill from the
    bounding observations proportionally to the TIME distance; leading/
    trailing gaps stay NULL (interpolation, not extrapolation) — the
    imputation companion to LOCF, in the same one-exchange kernel."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def mask(b: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(b.column("event_type"), "error"),
            pa.scalar(None, pa.float64()),
            b.column("value"),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value": v,
            }
        )

    masked = ev.map_batches(mask, batch_format="pyarrow")
    out = grouped_running(
        masked, key="user_id", order_col="ts", value_col="value",
        kinds=[("value_interp", "linear_interp")], tiebreak="event_id",
        round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "value_interp"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_value_interp"] = q_events_value_interp
ORACLE_SQL["q_events_value_interp"] = """
    WITH m AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS t,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, v, t,
             last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM m
    )
    SELECT event_id, user_id,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL OR nv IS NULL THEN NULL
             WHEN nt <= pt THEN pv
             ELSE pv + (nv - pv) * ((t - pt) / (nt - pt))
           END, 6) AS value_interp
    FROM w
"""


def q_events_value_ewma(sf_dir: str):
    """Exponentially weighted moving average of each user's value stream
    (alpha = 0.3, pandas ewm(adjust=False) semantics) — the streaming
    smoother; per-run closed form = two vectorized passes, overflow-safe
    chunk folding for long series.  Rows-only (SQL has no EWMA); the
    recurrence is pinned == pandas by `test_ewma_matches_pandas`."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_running(
        ev, key="user_id", order_col="ts", value_col="value",
        kinds=[("value_ewma", ("ewma", 0.3))], tiebreak="event_id",
        round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "value_ewma"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_value_ewma"] = q_events_value_ewma


def q_events_trailing_zscore(sf_dir: str):
    """Windowed anomaly features: each event's value vs its own user's
    trailing 3-day mean/stddev (RANGE frame; stddev NULL when the window
    holds < 2 events) — the streaming z-score every monitoring pipeline
    derives, from the same two-searchsorted band sums as the count/sum
    path."""
    from ..stages.window import grouped_trailing_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_trailing_agg(
        ev, key="user_id", ts_col="ts", value_col="value",
        width_s=3 * 24 * 3600.0, out_sum=None,
        out_mean="w_mean", out_std="w_std", round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "w_count", "w_mean", "w_std"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_trailing_zscore"] = q_events_trailing_zscore
ORACLE_SQL["q_events_trailing_zscore"] = """
    SELECT event_id, user_id,
           count(*) OVER w AS w_count,
           round(avg(value) OVER w, 6) AS w_mean,
           round(stddev_samp(value) OVER w, 6) AS w_std
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)
"""


def q_events_rolling_median(sf_dir: str):
    """Exact trailing 7-row median of each user's value stream — the
    order-statistic window (robust smoother; unlike the moving mean, a
    single spike cannot drag it).  Full windows are one strided-view
    np.median per key run; only the ≤6 ramp-up rows per run are scalar."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_running(
        ev, key="user_id", order_col="ts", value_col="value",
        kinds=[("value_med7", ("rolling_median", 7))], tiebreak="event_id",
        round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "value_med7"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_rolling_median"] = q_events_rolling_median
ORACLE_SQL["q_events_rolling_median"] = """
    SELECT event_id, user_id,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS value_med7
    FROM events
"""


def q_events_robust_outliers(sf_dir: str):
    """Robust per-event-type outlier report: exact median + MAD and the
    count of |x − med| > 3·1.4826·MAD points — the contamination-proof
    alternative to mean/stddev cuts (a heavy tail cannot inflate its own
    threshold).  One exchange; medians need the group co-located, exactly
    like grouped_quantiles."""
    from ..stages.agg import grouped_robust_outliers

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_robust_outliers(ev, "event_type", "value")


QUERIES["q_events_robust_outliers"] = q_events_robust_outliers
ORACLE_SQL["q_events_robust_outliers"] = """
    WITH g AS (
      SELECT event_type, median(value) AS med, mad(value) AS mad_v
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           round(any_value(g.med), 6) AS med,
           round(any_value(g.mad_v), 6) AS mad_v,
           count(*) FILTER (WHERE abs(e.value - g.med) > 4.4478 * g.mad_v)
               AS n_outliers
    FROM events e JOIN g USING (event_type)
    GROUP BY e.event_type
"""


def q_user_value_twap(sf_dir: str):
    """Time-weighted average value per user (each event's value held until
    the user's next event) — the step-series mean every pricing/telemetry
    pipeline needs when sampling is irregular; plain AVG over-weights
    bursts.  Pure reduction: one exchange, segmented reduceat kernel."""
    from ..stages.window import time_weighted_avg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return time_weighted_avg(
        ev, key="user_id", ts_col="ts", value_col="value",
        out_name="twap", tiebreak="event_id", round_to=6,
    )


QUERIES["q_user_value_twap"] = q_user_value_twap
ORACLE_SQL["q_user_value_twap"] = """
    WITH w AS (
      SELECT user_id, value,
             CAST(date_diff('microsecond', ts,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                  AS DOUBLE) AS dur
      FROM events
    )
    SELECT user_id, round(sum(value * dur) / sum(dur), 6) AS twap
    FROM w
    WHERE dur IS NOT NULL
    GROUP BY user_id
    HAVING sum(dur) > 0
"""


def q_label_centroids(sf_dir: str):
    """Per-label element-wise embedding centroid (long form: label, dim,
    centroid) — the class-prototype aggregate behind nearest-centroid
    classification and cluster drift monitoring.  Map-side combiner
    collapses each block to |labels|×64 partial sums; the exchange never
    sees raw vectors."""
    from ..stages.ann import group_vector_mean

    emb = _read(sf_dir, "embeddings", ["label", "embedding"])
    return group_vector_mean(emb, "label", col="embedding", round_to=6,
                             out_name="centroid")


QUERIES["q_label_centroids"] = q_label_centroids
ORACLE_SQL["q_label_centroids"] = """
    -- range(64) = the corpus's fixed embedding width (DuckDB's range()
    -- only takes constants; the len() guard keeps it exact regardless)
    SELECT label, CAST(gs.i AS BIGINT) AS dim,
           round(avg(embedding[gs.i + 1]), 6) AS centroid
    FROM embeddings
    CROSS JOIN range(64) AS gs(i)
    WHERE gs.i < len(embedding)
    GROUP BY label, gs.i
"""


def q_price_weighted_quantiles(sf_dir: str):
    """Quantity-weighted price quantiles per return flag: the smallest
    price at which half (p50) / 90% (p90) of the UNITS (not line rows)
    have been covered — inventory/value-at-risk style weighted order
    statistics.  Integer-valued double weights make the cumulative-weight
    threshold bit-exact vs the SQL window formulation."""
    from ..stages.agg import grouped_weighted_quantiles

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    return grouped_weighted_quantiles(
        li, "l_returnflag", "l_extendedprice", "l_quantity",
        [("wq50", 0.5), ("wq90", 0.9)], round_to=2,
    )


QUERIES["q_price_weighted_quantiles"] = q_price_weighted_quantiles
ORACLE_SQL["q_price_weighted_quantiles"] = """
    WITH s AS (
      SELECT l_returnflag, l_extendedprice AS x,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice
                 ROWS UNBOUNDED PRECEDING) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           round(min(x) FILTER (WHERE cw >= 0.5 * tw), 2) AS wq50,
           round(min(x) FILTER (WHERE cw >= 0.9 * tw), 2) AS wq90
    FROM s
    GROUP BY l_returnflag
"""


def q_lineitem_spearman(sf_dir: str):
    """Spearman rank correlation between order quantity and line price —
    the monotonic-association measure robust to outliers and nonlinearity.
    Fully distributed: per-column fractional ranks (|distinct|-row
    shuffles + O(blocks) driver offsets), two hash joins, one mergeable-
    moment corr."""
    from ..stages.agg import spearman_corr

    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    return spearman_corr(li, "l_quantity", "l_extendedprice",
                         out_name="spearman", round_to=6)


QUERIES["q_lineitem_spearman"] = q_lineitem_spearman
ORACLE_SQL["q_lineitem_spearman"] = """
    WITH r AS (
      SELECT rank() OVER (ORDER BY l_quantity)
                 + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY l_extendedprice)
                 + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
      FROM lineitem
    )
    SELECT round(corr(rx, ry), 6) AS spearman FROM r
"""


def q_benford_totalprice(sf_dir: str):
    """Benford first-digit screen on order totals — the forensic
    data-quality check for fabricated/truncated monetary columns.  Digit
    extraction is pure integer arithmetic (cents → repeated //10), so the
    bucketing is exact; ≤9 partial rows per block, one tiny merge."""
    from ..stages.validate import benford_digit_report

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return benford_digit_report(orders, "o_totalprice", round_to=6)


QUERIES["q_benford_totalprice"] = q_benford_totalprice
ORACLE_SQL["q_benford_totalprice"] = """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    )
    SELECT digit, count(*) AS n,
           round(count(*) / sum(count(*)) OVER (), 6) AS share,
           round(log10(1 + 1.0 / digit), 6) AS expected
    FROM d GROUP BY digit
"""


def _ab_split_case() -> str:
    from ..stages.sample import sql_split_case

    return sql_split_case("user_id", [("A", 0.5), ("B", 0.5)], seed="ab1")


def q_ab_value_ttest(sf_dir: str):
    """A/B experiment readout: users deterministically hash-split 50/50,
    then per event_type a Welch two-sample t on value (t statistic +
    Welch–Satterthwaite df).  The raw stream is touched once; the test
    statistics come from mergeable moments."""
    from ..stages.agg import ab_welch_ttest
    from ..stages.sample import deterministic_split

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    sp = deterministic_split(
        ev, id_col="user_id", splits=[("A", 0.5), ("B", 0.5)], seed="ab1",
        out_col="variant",
    )
    return ab_welch_ttest(sp, "event_type", "variant", "value")


QUERIES["q_ab_value_ttest"] = q_ab_value_ttest
ORACLE_SQL["q_ab_value_ttest"] = f"""
    WITH s AS (
      SELECT event_type, {_ab_split_case()} AS variant, value FROM events
    ), g AS (
      SELECT event_type, variant, count(*) AS n, avg(value) AS m,
             var_samp(value) AS v
      FROM s GROUP BY event_type, variant
    )
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
           round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 6) AS t_welch,
           round(pow(a.v/a.n + b.v/b.n, 2) /
                 (pow(a.v/a.n, 2)/(a.n-1) + pow(b.v/b.n, 2)/(b.n-1)), 6)
               AS df_welch
    FROM g a JOIN g b USING (event_type)
    WHERE a.variant = 'A' AND b.variant = 'B'
"""


def q_concurrent_user_bursts(sf_dir: str):
    """Co-activity detection: coalesce each (event_type, user)'s event
    intervals into activity bursts, then an interval×interval OVERLAP
    self-join per event_type — pairs of users active at the same time,
    with total overlapped microseconds.  The inequality-join shape Ray
    Data lacks, as one co-partitioned band probe (no quadratic blowup)."""
    from ..stages.agg import grouped_agg
    from ..stages.joins import interval_overlap_join
    from ..stages.window import coalesce_intervals

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("ts"), pa.int64())
        dur = pc.cast(
            pc.floor(pc.multiply(b.column("value"), pa.scalar(60_000_000.0))),
            pa.int64(),
        )
        k = pc.binary_join_element_wise(
            b.column("event_type"), pc.cast(b.column("user_id"), pa.string()),
            "|",
        )
        return pa.table({"__k": k, "s": s, "e": pc.add(s, dur)})

    iv = ev.map_batches(prep, batch_format="pyarrow")
    spans = coalesce_intervals(iv, key="__k", start="s", end="e")

    def _split(suffix: str):
        def split(b: pa.Table) -> pa.Table:
            parts = pc.split_pattern(b.column("__k"), "|")
            return pa.table({
                "event_type": pc.list_element(parts, 0),
                f"user{suffix}": pc.cast(pc.list_element(parts, 1), pa.int64()),
                f"s{suffix}": b.column("span_start"),
                f"e{suffix}": b.column("span_end"),
            })

        return split

    left = spans.map_batches(_split("_a"), batch_format="pyarrow")
    right = spans.map_batches(_split("_b"), batch_format="pyarrow")

    def post(b: pa.Table) -> pa.Table:
        # fused key-local consumer: the raw pair stream never leaves the
        # reduce — only per-(type, pair) partial aggregates do
        t = b.filter(pc.less(b.column("user_a"), b.column("user_b")))
        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "user_a": pa.array([], pa.int64()),
                "user_b": pa.array([], pa.int64()),
                "np": pa.array([], pa.int64()),
                "ovp": pa.array([], pa.int64()),
            })
        ov = pc.subtract(
            pc.min_element_wise(t.column("e_a"), t.column("e_b")),
            pc.max_element_wise(t.column("s_a"), t.column("s_b")),
        )
        tt = pa.table({
            "event_type": t.column("event_type"),
            "user_a": t.column("user_a"),
            "user_b": t.column("user_b"),
            "ov": ov,
        })
        g = tt.group_by(["event_type", "user_a", "user_b"]).aggregate(
            [("ov", "count"), ("ov", "sum")]
        )
        return pa.table({
            "event_type": g.column("event_type"),
            "user_a": g.column("user_a"),
            "user_b": g.column("user_b"),
            "np": pc.cast(g.column("ov_count"), pa.int64()),
            "ovp": pc.cast(g.column("ov_sum"), pa.int64()),
        })

    # day chunks: few join keys (5 event types) would otherwise serialize
    # the reduce; chunking fans out to |types|·|days| partitions and
    # bounds the candidate band by the chunk width, not the longest burst
    pairs = interval_overlap_join(
        left, right, key="event_type",
        left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
        post=post, chunk=86_400_000_000,
    )
    return grouped_agg(
        pairs,
        ["event_type", "user_a", "user_b"],
        [("n_overlaps", "np", "sum"), ("overlap_us", "ovp", "sum")],
        sum_as_float=False,
    )


QUERIES["q_concurrent_user_bursts"] = q_concurrent_user_bursts
ORACLE_SQL["q_concurrent_user_bursts"] = """
    WITH iv AS (
      SELECT event_type, user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
      FROM events
    ),
    flagged AS (
      SELECT event_type, user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY event_type, user_id
                  ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new
      FROM iv
    ),
    isl AS (
      SELECT event_type, user_id, s, e,
             sum(new) OVER (PARTITION BY event_type, user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    spans AS (
      SELECT event_type, user_id, min(s) AS ss, max(e) AS se
      FROM isl GROUP BY event_type, user_id, grp
    )
    SELECT a.event_type, a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_overlaps,
           CAST(sum(least(a.se, b.se) - greatest(a.ss, b.ss)) AS BIGINT)
               AS overlap_us
    FROM spans a JOIN spans b
      ON a.event_type = b.event_type AND a.user_id < b.user_id
     AND a.ss < b.se AND b.ss < a.se
    GROUP BY a.event_type, a.user_id, b.user_id
"""


def q_events_value_drift(sf_dir: str):
    """Feature-drift monitoring: PSI (population stability index) of the
    value distribution, first half of January as the reference vs the rest
    as current — reference-decile bins, per-bin shares and PSI terms.
    The edges come from the exact quantile operator (t-digest swap
    documented for 100 TB)."""
    from ..stages.validate import drift_psi_report

    ev = _read(sf_dir, "events", ["ts", "value"])

    def side(b: pa.Table) -> pa.Table:
        cut = pa.scalar(1705363200000000, pa.int64())  # 2024-01-16 UTC, us
        s = pc.cast(
            pc.greater_equal(pc.cast(b.column("ts"), pa.int64()), cut),
            pa.int8(),
        )
        return pa.table({"value": b.column("value"), "side": s})

    return drift_psi_report(
        ev.map_batches(side, batch_format="pyarrow"), "value", "side",
        n_bins=10, round_to=6,
    )


def _psi_sql() -> str:
    cutoff = "TIMESTAMP '2024-01-16'"
    qexprs = ", ".join(
        f"round(quantile_cont(value, {i / 10}), 6) AS e{i}" for i in range(1, 10)
    )
    binexpr = " + ".join(
        f"CASE WHEN value > e.e{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    )
    return f"""
    WITH e AS (SELECT {qexprs} FROM events WHERE ts < {cutoff}),
    b AS (
      SELECT CASE WHEN ts < {cutoff} THEN 0 ELSE 1 END AS side,
             {binexpr} AS bin
      FROM events, e
    ),
    g AS (SELECT side, bin, count(*) AS n FROM b GROUP BY side, bin),
    p AS (
      SELECT bin,
             CAST(coalesce(sum(CASE WHEN side = 0 THEN n END), 0) AS BIGINT)
                 AS n_ref,
             CAST(coalesce(sum(CASE WHEN side = 1 THEN n END), 0) AS BIGINT)
                 AS n_cur
      FROM g GROUP BY bin
    ),
    t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM p)
    SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
           round(n_ref / t.tr, 6) AS p_ref,
           round(n_cur / t.tc, 6) AS p_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0 THEN
             round((n_cur / t.tc - n_ref / t.tr)
                   * ln((n_cur / t.tc) / (n_ref / t.tr)), 6)
           END AS psi_term
    FROM p, t
    """


QUERIES["q_events_value_drift"] = q_events_value_drift
ORACLE_SQL["q_events_value_drift"] = _psi_sql()


def q_event_type_dow_mi(sf_dir: str):
    """Exact mutual information (nats) between event type and ISO weekday
    — the categorical-dependence screen (feature selection, leakage
    detection).  One contingency grouped_agg; the tiny table finalizes in
    a single-partition kernel."""
    from ..stages.agg import mutual_information

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b.column("ts")), pa.scalar(1, pa.int64()))
        return pa.table({"event_type": b.column("event_type"),
                         "dow": pc.cast(dow, pa.int64())})

    return mutual_information(
        ev.map_batches(prep, batch_format="pyarrow"), "event_type", "dow",
        out_name="mi_nats", round_to=6,
    )


QUERIES["q_event_type_dow_mi"] = q_event_type_dow_mi
ORACLE_SQL["q_event_type_dow_mi"] = """
    WITH j AS (
      SELECT event_type AS x, CAST(isodow(ts) AS BIGINT) AS y, count(*) AS n
      FROM events GROUP BY x, y
    ),
    t AS (SELECT sum(n) AS total FROM j),
    mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY x),
    my AS (SELECT y, sum(n) AS ny FROM j GROUP BY y)
    SELECT round(sum((j.n / t.total)
               * ln((j.n * t.total) / (mx.nx * my.ny))), 6) AS mi_nats
    FROM j CROSS JOIN t
    JOIN mx ON j.x = mx.x
    JOIN my ON j.y = my.y
"""


def q_events_value_cusum(sf_dir: str):
    """CUSUM drift detector per user (one-sided, clamp at zero, drift 75):
    the sequential change-point statistic as two vectorized accumulates —
    the recurrence max(0, s+(x−d)) closed-forms to cumsum − running min,
    which is also exactly two SQL window functions (bit-identical fp
    order).  ``alarm`` flags rounded statistic > 300."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_running(
        ev, key="user_id", order_col="ts", value_col="value",
        kinds=[("cusum_stat", ("cusum", 75.0))], tiebreak="event_id",
        round_to=6,
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "cusum_stat": b.column("cusum_stat"),
            "alarm": pc.cast(
                pc.greater(b.column("cusum_stat"), pa.scalar(300.0)),
                pa.int64(),
            ),
        })

    return out.map_batches(fin, batch_format="pyarrow")


QUERIES["q_events_value_cusum"] = q_events_value_cusum
ORACLE_SQL["q_events_value_cusum"] = """
    WITH c AS (
      SELECT event_id, user_id, ts,
             sum(value - 75.0) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id,
           round(c - least(min(c) OVER w2, 0), 6) AS cusum_stat,
           CAST(round(c - least(min(c) OVER w2, 0), 6) > 300.0 AS BIGINT)
               AS alarm
    FROM c
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)
"""


def q_top_qty_lineitems_ties(sf_dir: str):
    """Top-2 quantities per order WITH TIES (SQL rank() <= 2): every line
    tying the 2nd-highest quantity survives — the FETCH FIRST ... WITH
    TIES semantics; heavy integer-quantity ties make the tie set real."""
    from ..stages.agg import grouped_topk

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity"])
    return grouped_topk(li, "l_orderkey", "l_quantity", 2, descending=True,
                        with_ties=True)


QUERIES["q_top_qty_lineitems_ties"] = q_top_qty_lineitems_ties
ORACLE_SQL["q_top_qty_lineitems_ties"] = """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             rank() OVER (PARTITION BY l_orderkey
                          ORDER BY l_quantity DESC) AS r
      FROM lineitem
    )
    WHERE r <= 2
"""


def q_doc_lm_perplexity(sf_dir: str):
    """Bigram-LM perplexity per document (add-0.1 smoothing, context =
    full unigram count) — the CCNet-style fluency/quality filter for
    pretraining corpora.  Train and score in one distributed plan: two
    count aggregates, two hash joins, one per-doc mean."""
    from ..stages.text import lm_perplexity

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return lm_perplexity(docs, col="text", id_col="doc_id", alpha=0.1,
                         round_to=6)


QUERIES["q_doc_lm_perplexity"] = q_doc_lm_perplexity
ORACLE_SQL["q_doc_lm_perplexity"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM t
    ),
    bc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
    uni AS (SELECT unnest(toks) AS tok FROM t),
    uc AS (SELECT tok, count(*) AS cu FROM uni GROUP BY tok),
    v AS (SELECT count(*) AS vs FROM uc)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(exp(-avg(ln((bc.cb + 0.1) / (uc.cu + 0.1 * v.vs)))), 6)
               AS perplexity
    FROM bg
    JOIN bc USING (bigram)
    JOIN uc ON split_part(bg.bigram, ' ', 1) = uc.tok
    CROSS JOIN v
    GROUP BY bg.doc_id
"""


def q_doc_decontamination(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 37 = 0 act as the
    held-out benchmark; every other doc is flagged when it shares ANY
    word 3-gram with the benchmark (GPT-3/Llama-style n-gram overlap
    check).  Benchmark grams broadcast once; training side never
    shuffles."""
    from ..stages.text import ngram_decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mod37_is(val: int):
        # doc_id − (doc_id // 37)·37 (pyarrow has no modulo kernel)
        def f(b: pa.Table) -> pa.Table:
            did = b.column("doc_id")
            rem = pc.subtract(
                did, pc.multiply(pc.divide(did, pa.scalar(37)), pa.scalar(37))
            )
            op = pc.equal if val == 0 else pc.not_equal
            return b.filter(op(rem, pa.scalar(0)))

        return f

    bench = docs.map_batches(mod37_is(0), batch_format="pyarrow")
    train = docs.map_batches(mod37_is(1), batch_format="pyarrow")
    return ngram_decontaminate(train, bench, n=3, col="text",
                               id_col="doc_id")


QUERIES["q_doc_decontamination"] = q_doc_decontamination
ORACLE_SQL["q_doc_decontamination"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ng
      FROM t
    ),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
    train AS (SELECT * FROM g WHERE doc_id % 37 <> 0)
    SELECT tr.doc_id,
           CAST(count(b.ng) AS BIGINT) AS n_hits,
           CAST(count(b.ng) > 0 AS BIGINT) AS contaminated
    FROM train tr LEFT JOIN bench b ON tr.ng = b.ng
    GROUP BY tr.doc_id
"""


def q_purchase_value_auc(sf_dir: str):
    """ROC-AUC of event value as a purchase classifier (Mann–Whitney with
    tie correction) — the model-eval primitive, distributed via the same
    fractional-rank machinery as Spearman: |distinct score| shuffle +
    O(blocks) offsets, one join, one scalar aggregate."""
    from ..stages.agg import roc_auc

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "value": b.column("value"),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
        })

    return roc_auc(ev.map_batches(prep, batch_format="pyarrow"),
                   "value", "y", out_name="auc", round_to=6)


QUERIES["q_purchase_value_auc"] = q_purchase_value_auc
ORACLE_SQL["q_purchase_value_auc"] = """
    WITH r AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             rank() OVER (ORDER BY value)
                 + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS fr
      FROM events
    )
    SELECT round((sum(CASE WHEN y = 1 THEN fr END)
                  - (sum(y) * (sum(y) + 1)) / 2.0)
                 / (sum(y) * (count(*) - sum(y))), 6) AS auc
    FROM r
"""


def q_embedding_self_nn(sf_dir: str):
    """Exact nearest neighbor for EVERY vector (kNN self-join, k=1,
    self excluded) — one data pass: the full id+matrix broadcast once,
    one matmul per batch, per-query top-2 merge, self filtered, final
    cut.  Round-then-cut keeps rounded ties deterministic (id asc),
    matching the SQL window order."""
    import numpy as np
    import ray

    from ..stages.agg import grouped_topk
    from ..stages.ann import _stack, cosine_topk_multi

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    tabs = [t for t in ray.get(emb.to_arrow_refs()) if t.num_columns > 0]
    full = pa.concat_tables(tabs)
    ids = full.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _stack(full)

    res = cosine_topk_multi(emb, mat, k=2, query_ids=ids, round_to=4)
    noself = res.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("query_id"),
                                        b.column("vec_id"))),
        batch_format="pyarrow",
    )
    best = grouped_topk(noself, "query_id", "sim", 1, descending=True,
                        tiebreak=["vec_id"])
    return best.map_batches(
        lambda b: pa.table({
            "vec_id": b.column("query_id"),
            "nn_id": b.column("vec_id"),
            "cos": b.column("sim"),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_embedding_self_nn"] = q_embedding_self_nn
ORACLE_SQL["q_embedding_self_nn"] = """
    WITH p AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4)
                 AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, nn_id, cos
    FROM (
      SELECT vec_id, nn_id, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, nn_id) AS rn
      FROM p
    )
    WHERE rn = 1
"""


def q_hybrid_search_rrf(sf_dir: str):
    """Hybrid search with reciprocal-rank fusion: a keyword ranking
    (occurrences of 'spark') and a vector ranking (cosine vs doc 0's
    embedding) fused as Σ 1/(60+rank) — the standard BM25+ANN fusion.
    Both rankings are distributed: range sort + O(blocks) global row
    numbers (blocks never move), one hash join, global top-10."""
    import numpy as np
    import ray

    from ..stages.agg import global_topk
    from ..stages.ann import _normalize, _stack
    from ..stages.joins import hash_join
    from ..stages.sort import global_row_numbers, range_sort

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def kw(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "kw_score": pc.cast(
                pc.count_substring(b.column("text"), "spark"), pa.int64()),
        })

    kr = global_row_numbers(
        range_sort(docs.map_batches(kw, batch_format="pyarrow"),
                   "kw_score", descending=True, tiebreak=["doc_id"]),
        out_name="r_kw",
    )

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = [t for t in ray.get(
        emb.map_batches(
            lambda b: b.filter(pc.equal(b.column("vec_id"), pa.scalar(0))),
            batch_format="pyarrow",
        ).to_arrow_refs()) if t.num_rows > 0]
    qv = _normalize(_stack(pa.concat_tables(q0)))[0]
    qref = ray.put(qv)

    def score(b: pa.Table) -> pa.Table:
        import numpy as np
        import ray as _ray

        m = _normalize(_stack(b))
        sims = np.round(m @ _ray.get(qref), 4)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "sim": pa.array(sims, pa.float64()),
        })

    vr = global_row_numbers(
        range_sort(emb.map_batches(score, batch_format="pyarrow"),
                   "sim", descending=True, tiebreak=["vec_id"]),
        out_name="r_vec",
    )

    j = hash_join(
        kr.map_batches(lambda b: b.select(["doc_id", "r_kw"]),
                       batch_format="pyarrow"),
        vr.map_batches(lambda b: b.select(["vec_id", "r_vec"]),
                       batch_format="pyarrow"),
        left_key="doc_id", right_key="vec_id",
    )

    def fuse(b: pa.Table) -> pa.Table:
        import numpy as np

        rk = b.column("r_kw").to_numpy(zero_copy_only=False).astype(np.float64)
        rv = b.column("r_vec").to_numpy(zero_copy_only=False).astype(np.float64)
        from ..stages.agg import round_like_duckdb

        return pa.table({
            "doc_id": b.column("doc_id"),
            "r_kw": b.column("r_kw"),
            "r_vec": b.column("r_vec"),
            "rrf_score": round_like_duckdb(
                pa.array(1.0 / (60.0 + rk) + 1.0 / (60.0 + rv)), 6),
        })

    return global_topk(
        j.map_batches(fuse, batch_format="pyarrow"),
        ["rrf_score", "doc_id"], 10, descending=[True, False],
    )


QUERIES["q_hybrid_search_rrf"] = q_hybrid_search_rrf
ORACLE_SQL["q_hybrid_search_rrf"] = """
    WITH kw AS (
      SELECT doc_id,
             (length(text) - length(replace(text, 'spark', ''))) / 5
                 AS kw_score
      FROM documents
    ),
    kr AS (SELECT doc_id,
                  row_number() OVER (ORDER BY kw_score DESC, doc_id) AS r_kw
           FROM kw),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = 0),
    vs AS (
      SELECT vec_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv),
                   4) AS sim
      FROM embeddings, q
    ),
    vr AS (SELECT vec_id,
                  row_number() OVER (ORDER BY sim DESC, vec_id) AS r_vec
           FROM vs)
    SELECT doc_id, r_kw, r_vec,
           round(1.0 / (60 + r_kw) + 1.0 / (60 + r_vec), 6) AS rrf_score
    FROM kr JOIN vr ON kr.doc_id = vr.vec_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
"""


def q_events_rolling_extrema(sf_dir: str):
    """Trailing 7-row min and max of each user's value stream (ROWS-frame
    order-statistic windows; the band envelope for anomaly dashboards),
    from the same strided-view machinery as the rolling median."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_running(
        ev, key="user_id", order_col="ts", value_col="value",
        kinds=[("v_min7", ("rolling_min", 7)), ("v_max7", ("rolling_max", 7))],
        tiebreak="event_id", round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "v_min7", "v_max7"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_rolling_extrema"] = q_events_rolling_extrema
ORACLE_SQL["q_events_rolling_extrema"] = """
    SELECT event_id, user_id,
           round(min(value) OVER w, 6) AS v_min7,
           round(max(value) OVER w, 6) AS v_max7
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_event_type_dow_chi2(sf_dir: str):
    """Pearson chi-square independence test between event type and ISO
    weekday (zero-observed cells contribute their expectation) — the
    classical drift screen next to the MI query, same one-pass
    contingency aggregate."""
    from ..stages.agg import chi_square_independence

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b.column("ts")), pa.scalar(1, pa.int64()))
        return pa.table({"event_type": b.column("event_type"),
                         "dow": pc.cast(dow, pa.int64())})

    return chi_square_independence(
        ev.map_batches(prep, batch_format="pyarrow"), "event_type", "dow",
        round_to=6,
    )


QUERIES["q_event_type_dow_chi2"] = q_event_type_dow_chi2
ORACLE_SQL["q_event_type_dow_chi2"] = """
    WITH j AS (
      SELECT event_type AS x, CAST(isodow(ts) AS BIGINT) AS y, count(*) AS n
      FROM events GROUP BY x, y
    ),
    mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY x),
    my AS (SELECT y, sum(n) AS ny FROM j GROUP BY y),
    t AS (SELECT sum(n) AS total FROM j),
    cells AS (
      SELECT mx.nx, my.ny, coalesce(j.n, 0) AS o
      FROM mx CROSS JOIN my
      LEFT JOIN j ON j.x = mx.x AND j.y = my.y
    )
    SELECT round(sum(pow(o - nx * ny / t.total, 2)
                     / (nx * ny / t.total)), 6) AS chi2,
           CAST((SELECT count(*) - 1 FROM mx)
                * (SELECT count(*) - 1 FROM my) AS BIGINT) AS df
    FROM cells CROSS JOIN t
    GROUP BY ALL
"""


def q_global_price_quantiles_exact(sf_dir: str):
    """EXACT global price quantiles by distributed SELECTION, not a sort:
    sample pivot ladder → one broadcast count pass → collect only the
    target intervals (expected n/(samples·blocks) rows) — the 100 TB
    path for global order statistics; t-digest remains the one-pass
    approximate swap."""
    from ..stages.sort import global_exact_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    vals = global_exact_quantiles(
        li, "l_extendedprice", [("p50", 0.5), ("p95", 0.95)], round_to=2,
    )
    return pa.table({"p50": pa.array([vals["p50"]], pa.float64()),
                     "p95": pa.array([vals["p95"]], pa.float64())})


QUERIES["q_global_price_quantiles_exact"] = q_global_price_quantiles_exact
ORACLE_SQL["q_global_price_quantiles_exact"] = """
    SELECT round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 2) AS p95
    FROM lineitem
"""


def q_purchase_auc_by_dow(sf_dir: str):
    """Per-weekday ROC-AUC of value as a purchase classifier — the
    sliced model-eval report (find the segment where the model breaks);
    groups co-located once, tie-averaged ranks vectorized in-group."""
    from ..stages.agg import grouped_roc_auc

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b.column("ts")), pa.scalar(1, pa.int64()))
        return pa.table({
            "dow": pc.cast(dow, pa.int64()),
            "value": b.column("value"),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
        })

    return grouped_roc_auc(ev.map_batches(prep, batch_format="pyarrow"),
                           "dow", "value", "y")


QUERIES["q_purchase_auc_by_dow"] = q_purchase_auc_by_dow
ORACLE_SQL["q_purchase_auc_by_dow"] = """
    WITH r AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS dow,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             rank() OVER (PARTITION BY isodow(ts) ORDER BY value)
                 + (count(*) OVER (PARTITION BY isodow(ts), value) - 1)
                   / 2.0 AS fr
      FROM events
    )
    SELECT dow,
           round((sum(CASE WHEN y = 1 THEN fr END)
                  - sum(y) * (sum(y) + 1) / 2.0)
                 / (sum(y) * (count(*) - sum(y))), 6) AS auc
    FROM r GROUP BY dow
"""


def q_doc_packing(sf_dir: str):
    """Greedy sequence packing of documents into 4096-char training packs
    (first-fit-decreasing per hash partition, globally unique pack ids) —
    the assemble-LM-batches operator.  Rows-only: bin packing has no SQL
    equivalent; invariants (capacity, exactly-once, determinism) are
    pinned by `test_pack_sequences_invariants`."""
    from ..stages.sample import pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return pack_sequences(docs, id_col="doc_id", len_col="n_chars",
                          max_len=4096)


QUERIES["q_doc_packing"] = q_doc_packing


def q_near_dup_split_leakage(sf_dir: str):
    """Fuzzy train/test leakage: EXACT 3-gram-Jaccard ≥ 0.8 near-dup
    pairs whose two docs landed in DIFFERENT splits — the stricter
    cousin of exact-text split contamination (a paraphrased eval doc in
    train evades the sha256 check but not this one).  The split is a
    pure hash of doc_id, so both sides tag map-side with no extra join."""
    from ..stages.agg import grouped_agg
    from ..stages.sample import _hash_ints, split_thresholds
    from ..stages.sim import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3)

    bounds = split_thresholds(_SPLITS)
    names = [n for n, _ in bounds]
    edges = [b for _, b in bounds[:-1]]

    def tag(b: pa.Table) -> pa.Table:
        import numpy as np

        cols = {}
        for side in ("doc_a", "doc_b"):
            h = _hash_ints(b.column(side), "r1")
            idx = np.searchsorted(np.array(edges, np.uint64), h, side="right")
            cols["split_" + side[-1]] = pa.array(np.array(names)[idx])
        t = pa.table({**cols, "doc_a": b.column("doc_a")})
        return t.filter(pc.not_equal(t.column("split_a"),
                                     t.column("split_b")))

    tagged = pairs.map_batches(tag, batch_format="pyarrow")
    return grouped_agg(tagged, ["split_a", "split_b"],
                       [("n_pairs", "doc_a", "count")])


QUERIES["q_near_dup_split_leakage"] = q_near_dup_split_leakage


def _near_dup_leakage_sql() -> str:
    from ..stages.sample import sql_split_case

    case_a = sql_split_case("doc_a", _SPLITS, seed="r1")
    case_b = sql_split_case("doc_b", _SPLITS, seed="r1")
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN range(1, len(t)-1)])
        END AS gs
      FROM toks
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.gs, b.gs)) AS inter,
             len(a.gs) AS sa, len(b.gs) AS sb
      FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    ),
    jp AS (
      SELECT doc_a, doc_b FROM pairs
      WHERE CAST(inter AS DOUBLE) / (sa + sb - inter) >= 0.8
    ),
    tagged AS (
      SELECT {case_a} AS split_a, {case_b} AS split_b FROM jp
    )
    SELECT split_a, split_b, count(*) AS n_pairs
    FROM tagged
    WHERE split_a <> split_b
    GROUP BY split_a, split_b
    """


ORACLE_SQL["q_near_dup_split_leakage"] = _near_dup_leakage_sql()


def q_events_value_smooth(sf_dir: str):
    """Centered ±3-row moving-average smoothing of each user's value
    stream (symmetric FOLLOWING frame, no phase lag — the plotting/
    denoising window, unlike the trailing mean): interior rows one
    strided-view mean per key run."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = grouped_running(
        ev, key="user_id", order_col="ts", value_col="value",
        kinds=[("v_smooth", ("centered_mean", 3))], tiebreak="event_id",
        round_to=6,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "v_smooth"]),
        batch_format="pyarrow",
    )


QUERIES["q_events_value_smooth"] = q_events_value_smooth
ORACLE_SQL["q_events_value_smooth"] = """
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) AS v_smooth
    FROM events
"""


def q_user_golden_record(sf_dir: str):
    """Golden user profile by survivorship: per user, the latest non-null
    value of each field across the event stream (latest purchase amount,
    latest click amount, latest event type) — keep-latest would drop an
    older purchase when the newest event is a click; survivorship keeps
    both fields fresh."""
    from ..stages.dedup import survivorship_merge

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value")
        et = b.column("event_type")
        null = pa.scalar(None, pa.float64())
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "last_purchase_value": pc.if_else(
                pc.equal(et, pa.scalar("purchase")), v, null),
            "last_click_value": pc.if_else(
                pc.equal(et, pa.scalar("click")), v, null),
            "last_event_type": et,
        })

    return survivorship_merge(
        ev.map_batches(prep, batch_format="pyarrow"),
        group_col="user_id", order_col="ts", tiebreak="event_id",
        cols=["last_purchase_value", "last_click_value", "last_event_type"],
    )


QUERIES["q_user_golden_record"] = q_user_golden_record
ORACLE_SQL["q_user_golden_record"] = """
    SELECT user_id, last_purchase_value, last_click_value, last_event_type,
           n_merged
    FROM (
      SELECT user_id,
             last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS) OVER w AS last_purchase_value,
             last_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS) OVER w AS last_click_value,
             last_value(event_type IGNORE NULLS) OVER w AS last_event_type,
             count(*) OVER (PARTITION BY user_id) AS n_merged,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
    )
    WHERE rn = 1
"""


def q_qty_price_spearman_by_flag(sf_dir: str):
    """Per-return-flag Spearman between quantity and price — the sliced
    monotonic-association report; per-group tie-averaged ranks + Pearson
    on ranks inside one co-located kernel."""
    from ..stages.agg import grouped_spearman

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_spearman(li, "l_returnflag", "l_quantity",
                            "l_extendedprice")


QUERIES["q_qty_price_spearman_by_flag"] = q_qty_price_spearman_by_flag
ORACLE_SQL["q_qty_price_spearman_by_flag"] = """
    WITH r AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
                 + (count(*) OVER (PARTITION BY l_returnflag, l_quantity)
                    - 1) / 2.0 AS rx,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
                 + (count(*) OVER (PARTITION BY l_returnflag,
                                   l_extendedprice) - 1) / 2.0 AS ry
      FROM lineitem
    )
    SELECT l_returnflag, round(corr(rx, ry), 6) AS spearman
    FROM r GROUP BY l_returnflag
"""


def q_purchase_calibration(sf_dir: str):
    """Calibration report for a probability score (value/500 as pseudo
    P(purchase)): per predicted-probability bin, count, mean prediction,
    observed purchase rate — the reliability-diagram table behind every
    classifier dashboard.  Pure map + one combined aggregate."""
    from ..stages.agg import grouped_agg

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        import numpy as np

        v = b.column("value").to_numpy(zero_copy_only=False)
        pred = np.minimum(v / 500.0, 0.999999)
        return pa.table({
            "bin": pa.array(np.floor(pred * 10.0).astype(np.int64)),
            "pred": pa.array(pred, pa.float64()),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.float64()),
        })

    g = grouped_agg(
        ev.map_batches(prep, batch_format="pyarrow"), ["bin"],
        [("n", "pred", "count"), ("mean_pred", "pred", "mean"),
         ("obs_rate", "y", "mean")], round_to=6,
    )
    return g


QUERIES["q_purchase_calibration"] = q_purchase_calibration
ORACLE_SQL["q_purchase_calibration"] = """
    WITH p AS (
      SELECT CAST(floor(least(value / 500.0, 0.999999) * 10.0) AS BIGINT)
                 AS bin,
             least(value / 500.0, 0.999999) AS pred,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM events
    )
    SELECT bin, count(*) AS n,
           round(avg(pred), 6) AS mean_pred,
           round(avg(y), 6) AS obs_rate
    FROM p GROUP BY bin
"""


def q_purchase_gains_by_decile(sf_dir: str):
    """Gains/lift table: score deciles (global ntile over value DESC via
    range sort + O(blocks) row numbers — no full-sort take), per decile
    the purchase count, cumulative gain, and lift vs base rate — the
    targeting-model report."""
    import numpy as np

    from ..stages.agg import grouped_agg, grouped_map
    from ..stages.sort import global_row_numbers, range_sort

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "value": b.column("value"),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
        })

    scored = ev.map_batches(prep, batch_format="pyarrow")
    n_total = scored.count()
    ranked = global_row_numbers(
        range_sort(scored, "value", descending=True, tiebreak=["event_id"]),
        out_name="rn",
    )

    def decile(b: pa.Table) -> pa.Table:
        import numpy as np

        rn = b.column("rn").to_numpy(zero_copy_only=False) - 1  # 0-based
        k, n = 10, n_total
        q, r = n // k, n % k
        big = r * (q + 1)
        tile = np.where(rn < big, rn // max(q + 1, 1),
                        r + (rn - big) // max(q, 1)) + 1
        return pa.table({"decile": pa.array(tile.astype(np.int64)),
                         "y": b.column("y")})

    g = grouped_agg(
        ranked.map_batches(decile, batch_format="pyarrow"), ["decile"],
        [("n", "y", "count"), ("n_pos", "y", "sum")], sum_as_float=False,
    )

    def fin(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.agg import round_like_duckdb

        if t.num_rows == 0:
            return pa.table({"decile": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_pos": pa.array([], pa.int64()),
                             "cum_gain": pa.array([], pa.float64()),
                             "lift": pa.array([], pa.float64())})
        t = t.sort_by([("decile", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        pos = t.column("n_pos").to_numpy(zero_copy_only=False).astype(np.float64)
        total_pos, total_n = pos.sum(), n.sum()
        return pa.table({
            "decile": t.column("decile"),
            "n": t.column("n"),
            "n_pos": t.column("n_pos"),
            "cum_gain": round_like_duckdb(
                pa.array(np.cumsum(pos) / total_pos), 6),
            "lift": round_like_duckdb(
                pa.array((pos / n) / (total_pos / total_n)), 6),
        })

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", fin, per_group=False)
    return out.map_batches(
        lambda b: b.select(["decile", "n", "n_pos", "cum_gain", "lift"]),
        batch_format="pyarrow",
    )


QUERIES["q_purchase_gains_by_decile"] = q_purchase_gains_by_decile
ORACLE_SQL["q_purchase_gains_by_decile"] = """
    WITH r AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (ORDER BY value DESC, event_id) AS decile
      FROM events
    ),
    g AS (
      SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
      FROM r GROUP BY decile
    ),
    t AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS tp,
                 CAST(sum(n) AS DOUBLE) AS tn FROM g)
    SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
           round(sum(n_pos) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) / t.tp, 6) AS cum_gain,
           round((n_pos / CAST(n AS DOUBLE)) / (t.tp / t.tn), 6) AS lift
    FROM g CROSS JOIN t
"""


def q_doc_weighted_sample(sf_dir: str):
    """Exact-k weighted sampling without replacement (Efraimidis–Spirakis
    keys, deterministic seed): 50 documents drawn ∝ length — the
    temperature/importance mixture draw with a FIXED sample size, which
    probability-threshold sampling cannot give.  Rows-only (the key is a
    hash-uniform transform; selection ∝ weight is pinned statistically by
    `test_weighted_sample_k_es`)."""
    from ..stages.sample import weighted_sample_k

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample_k(docs, id_col="doc_id", weight_col="n_chars",
                             k=50, seed="ws1")


QUERIES["q_doc_weighted_sample"] = q_doc_weighted_sample


def q_part_price_size_skyline(sf_dir: str):
    """Skyline (Pareto frontier) query: parts where no other part is both
    cheaper-or-equal AND larger-or-equal (strictly better somewhere) —
    multi-objective selection without collapsing to a single score.  Each
    block prunes to its LOCAL skyline (lossless: in-block dominance implies
    global dominance), so the one single-partition merge sees only the tiny
    survivor union, never the raw table — no global sort, no quadratic pass
    over the data."""
    from ..stages.skyline import skyline

    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return skyline(part, [("p_retailprice", "min"), ("p_size", "max")])


QUERIES["q_part_price_size_skyline"] = q_part_price_size_skyline
ORACLE_SQL["q_part_price_size_skyline"] = """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
"""


def q_event_value_autocorr(sf_dir: str):
    """Per-type lag-1/2/3 autocorrelation of the event value series (the
    ACF ingredients of seasonality/trend diagnostics): one keyed exchange
    computes all three lag columns over the (ts, event_id)-ordered run,
    then the lagged stream collapses through the mergeable-moment corr
    aggregate — raw rows are touched once, the corr shuffle ships only
    Σx/Σx²/Σxy partials per (type, lag)."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    lagged = grouped_running(
        ev, key="event_type", order_col="ts", value_col="value",
        kinds=[("l1", ("lag", 1)), ("l2", ("lag", 2)), ("l3", ("lag", 3))],
        tiebreak="event_id",
    )
    return grouped_agg(
        lagged,
        ["event_type"],
        [
            ("acf1", ("value", "l1"), "corr"),
            ("acf2", ("value", "l2"), "corr"),
            ("acf3", ("value", "l3"), "corr"),
        ],
        round_to=6,
    )


QUERIES["q_event_value_autocorr"] = q_event_value_autocorr
ORACLE_SQL["q_event_value_autocorr"] = """
    WITH o AS (
      SELECT event_type, value,
             lag(value, 1) OVER w AS l1,
             lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           round(corr(value, l1), 6) AS acf1,
           round(corr(value, l2), 6) AS acf2,
           round(corr(value, l3), 6) AS acf3
    FROM o GROUP BY event_type
"""


def q_customer_rfm_segments(sf_dir: str):
    """RFM customer segmentation (the classic CRM cube): per customer
    recency = last order day, frequency = order count, monetary = total
    spend — one partial-combine aggregate over the fact stream — then
    ntile(5) quintile scores per axis and per-segment rollup.  The facts
    are touched once; the three quintile windows run over the per-CUSTOMER
    table (|customers| ≪ |orders|, same small-side assumption as every
    global ntile: one partition holds the dimension-sized aggregate)."""
    from ..stages.window import grouped_running

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("o_orderdate"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "day": day,
            "o_totalprice": b.column("o_totalprice"),
        })

    per_cust = grouped_agg(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        [
            ("last_day", "day", "max"),
            ("n_orders", "day", "count"),
            ("total_spent", "o_totalprice", "sum"),
        ],
        round_to=2,
    )
    keyed = per_cust.map_batches(
        lambda b: b.append_column("g", pa.array(np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    for score, metric in (("r_q", "last_day"), ("f_q", "n_orders"),
                          ("m_q", "total_spent")):
        keyed = grouped_running(
            keyed, key="g", order_col=metric, value_col=metric,
            kinds=[(score, ("ntile", 5))], tiebreak="o_custkey",
        )
    return grouped_agg(
        keyed,
        ["r_q", "f_q", "m_q"],
        [
            ("n_custs", "total_spent", "count"),
            ("avg_spent", "total_spent", "mean"),
        ],
        round_to=2,
    )


QUERIES["q_customer_rfm_segments"] = q_customer_rfm_segments
ORACLE_SQL["q_customer_rfm_segments"] = """
    WITH c AS (
      SELECT o_custkey,
             max(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)) AS last_day,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spent
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT ntile(5) OVER (ORDER BY last_day, o_custkey) AS r_q,
             ntile(5) OVER (ORDER BY n_orders, o_custkey) AS f_q,
             ntile(5) OVER (ORDER BY total_spent, o_custkey) AS m_q,
             total_spent
      FROM c
    )
    SELECT r_q, f_q, m_q, count(*) AS n_custs,
           round(avg(total_spent), 2) AS avg_spent
    FROM s GROUP BY 1, 2, 3
"""


def q_supply_graph_bfs(sf_dir: str):
    """BFS hop distances from supplier s1 over the undirected supplier–part
    supply graph (distinct lineitem edges): distributed min-plus label
    propagation, one keyed join + one pair exchange per round, convergence
    read as a single scalar — the reachability/radius primitive of the KG
    analytics layer.  Unreachable nodes (other components) drop, matching
    the recursive-CTE oracle."""
    from ..stages.graph import bfs_distances

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows), pc.cast(b.column("l_suppkey"), pa.string()), ""
        )
        d = pc.binary_join_element_wise(
            pa.array(["p"] * b.num_rows), pc.cast(b.column("l_partkey"), pa.string()), ""
        )
        return pa.table({"src": s, "dst": d})

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    distinct = grouped_agg(edges, ["src", "dst"], [("n", "src", "count")])
    edges = distinct.map_batches(
        lambda b: b.drop_columns(["n"]), batch_format="pyarrow"
    )
    out = bfs_distances(edges, ["s1"], directed=False, num_partitions=8)
    return out.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("dist"))),
        batch_format="pyarrow",
    )


QUERIES["q_supply_graph_bfs"] = q_supply_graph_bfs
ORACLE_SQL["q_supply_graph_bfs"] = """
    WITH RECURSIVE e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
    ),
    sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
    bfs AS (
      SELECT 's1' AS node, 0 AS dist
      UNION
      SELECT sym.dst AS node, bfs.dist + 1 AS dist
      FROM bfs JOIN sym ON sym.src = bfs.node
      WHERE bfs.dist < 12
    )
    SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
"""


def q_item_item_cosine(sf_dir: str):
    """Item-item collaborative-filtering similarity: cosine of the order
    co-occurrence vectors, sim(a,b) = co(a,b)/√(n_a·n_b) — the classic
    "customers also bought" normalization that discounts globally popular
    items.  Pair counts come from the per-order co-partition kernel
    (never a global self-join); per-part order counts are an exact
    count-distinct broadcast onto the pair stream (parts ≪ pairs); top-20
    by local-top-k + one tiny merge."""
    from ..stages.agg import global_topk, grouped_count_distinct

    counts = _basket_pair_counts(sf_dir)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    nper = grouped_count_distinct(li, ["l_partkey"], "l_orderkey", out_name="n")
    na = nper.map_batches(
        lambda b: pa.table({"pa_key": b.column("l_partkey"), "n_a": b.column("n")}),
        batch_format="pyarrow",
    )
    nb = nper.map_batches(
        lambda b: pa.table({"pb_key": b.column("l_partkey"), "n_b": b.column("n")}),
        batch_format="pyarrow",
    )
    j = broadcast_join(counts, na, left_key="part_a", right_key="pa_key",
                       columns=["n_a"])
    j = broadcast_join(j, nb, left_key="part_b", right_key="pb_key",
                       columns=["n_b"])

    def cosine(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        co = pc.cast(b.column("n_orders"), pa.float64())
        den = pc.sqrt(pc.multiply(
            pc.cast(b.column("n_a"), pa.float64()),
            pc.cast(b.column("n_b"), pa.float64()),
        ))
        return pa.table({
            "part_a": b.column("part_a"),
            "part_b": b.column("part_b"),
            "co": b.column("n_orders"),
            "cosine": round_like_duckdb(pc.divide(co, den), 6),
        })

    sims = j.map_batches(cosine, batch_format="pyarrow")
    return global_topk(
        sims, ["cosine", "part_a", "part_b"], 20,
        descending=[True, False, False],
    )


QUERIES["q_item_item_cosine"] = q_item_item_cosine
ORACLE_SQL["q_item_item_cosine"] = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT l_partkey, count(*) AS n FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS co
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, co,
           round(co / sqrt(na.n * nb.n), 6) AS cosine
    FROM pairs
    JOIN n na ON na.l_partkey = part_a
    JOIN n nb ON nb.l_partkey = part_b
    ORDER BY cosine DESC, part_a, part_b
    LIMIT 20
"""


def q_doc_pii_redaction(sf_dir: str):
    """PII scrubbing pass (the mandatory step before a corpus ships):
    deterministic PII (email/phone/IP derived from doc_id — the test corpus
    contains none) is planted into each document identically in Ray and in
    the oracle SQL, then redacted rule-by-rule with Arrow's RE2 kernels —
    the SAME regex engine DuckDB uses, so the redacted text compares
    cell-by-cell.  Fully vectorized (one replace_substring_regex per rule,
    no Python row loop); per-rule hit counts ride along for the audit."""
    from ..stages.text import redact_pii

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        did_s = pa.array(did.astype(str))
        ph = pa.array(np.char.zfill((did % 10000).astype(str), 4))
        ip3 = pa.array((did % 256).astype(str))
        ip4 = pa.array(((did * 7) % 256).astype(str))
        text = pc.binary_join_element_wise(
            b.column("text"), pa.scalar(" contact user"), did_s,
            pa.scalar("@example.com or +1-202-555-"), ph,
            pa.scalar(" from 192.168."), ip3, pa.scalar("."), ip4,
            pa.scalar(""),
        )
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    laced = docs.map_batches(synth, batch_format="pyarrow")
    red = laced.map_batches(redact_pii, batch_format="pyarrow")
    return red.map_batches(
        lambda b: b.rename_columns(
            ["doc_id", "clean_text", "n_email", "n_phone", "n_ipv4", "n_ssn"]
        ),
        batch_format="pyarrow",
    )


QUERIES["q_doc_pii_redaction"] = q_doc_pii_redaction
ORACLE_SQL["q_doc_pii_redaction"] = r"""
    WITH p AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-202-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
      FROM documents
    ),
    r1 AS (SELECT doc_id, text,
                  regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '[EMAIL]', 'g') AS t1 FROM p),
    r2 AS (SELECT *, regexp_replace(t1,
                    '\+?\d{1,2}-\d{3}-\d{3}-\d{4}', '[PHONE]', 'g') AS t2
           FROM r1),
    r3 AS (SELECT *, regexp_replace(t2,
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS t3
           FROM r2)
    SELECT doc_id,
           regexp_replace(t3, '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1,
                '\+?\d{1,2}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t2,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t3,
                '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn
    FROM r3
"""


def q_event_user_skew_report(sf_dir: str):
    """Hot-key skew diagnostic — the report you run BEFORE picking a
    partition key: top-20 users by event count with share of total,
    cumulative concentration (Lorenz/80-20 read), and ratio to the mean
    key load.  Per-key counts are one partial-combine aggregate; the two
    scalars (total rows, mean per key) are driver reads of that SMALL
    keyed table, broadcast into the final 20-row kernel — the raw stream
    is touched once."""
    from ..stages.agg import global_topk, grouped_map

    ev = _read(sf_dir, "events", ["user_id"])
    counts = grouped_agg(ev, ["user_id"], [("n", "user_id", "count")],
                         sum_as_float=False)
    counts = counts.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("n"), "n",
                               pc.cast(b.column("n"), pa.int64())),
        batch_format="pyarrow",
    ).materialize()
    total = float(counts.sum("n"))
    mean_n = total / counts.count()
    top = global_topk(counts, ["n", "user_id"], 20, descending=[True, False])
    keyed = top.map_batches(
        lambda b: b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )

    def fin(t: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        if "__g" in t.column_names:
            t = t.drop_columns(["__g"])
        t = t.sort_by([("n", "descending"), ("user_id", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        if len(n) == 0:
            return pa.table({
                "user_id": t.column("user_id"), "n": t.column("n"),
                "share": pa.array([], pa.float64()),
                "cum_share": pa.array([], pa.float64()),
                "skew_ratio": pa.array([], pa.float64()),
            })
        return pa.table({
            "user_id": t.column("user_id"),
            "n": t.column("n"),
            "share": round_like_duckdb(pa.array(n / total), 6),
            "cum_share": round_like_duckdb(pa.array(np.cumsum(n) / total), 6),
            "skew_ratio": round_like_duckdb(pa.array(n / mean_n), 6),
        })

    return grouped_map(keyed, "__g", fin, per_group=False, num_partitions=1)


QUERIES["q_event_user_skew_report"] = q_event_user_skew_report
ORACLE_SQL["q_event_user_skew_report"] = """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
                 CAST(avg(n) AS DOUBLE) AS mean_n FROM c),
    top AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id LIMIT 20)
    SELECT user_id, n, round(n / t.total, 6) AS share,
           round(sum(n) OVER (ORDER BY n DESC, user_id
                 ROWS UNBOUNDED PRECEDING) / t.total, 6) AS cum_share,
           round(n / t.mean_n, 6) AS skew_ratio
    FROM top CROSS JOIN t
"""


def q_purchase_last_touch_attribution(sf_dir: str):
    """Marketing last-touch attribution: each purchase is credited to the
    user's latest preceding non-purchase event (channel), then revenue
    rolls up per channel.  Rides the documented as-of composition (one
    keyed union shuffle + vectorized searchsorted merge); the channel
    string travels as an ORDER-PRESERVING int code (sorted-distinct enum,
    driver-read of a tiny aggregate) so the join's max-at-equal-ts
    tie-break equals SQL's max(event_type); purchases with no prior touch
    land in '(none)'."""
    import ray

    from ..stages.joins import asof_join_backward

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    is_p = lambda b: pc.equal(b.column("event_type"), pa.scalar("purchase"))  # noqa: E731
    purchases = ev.map_batches(
        lambda b: b.filter(is_p(b)).select(["user_id", "ts", "value"]),
        batch_format="pyarrow",
    )
    touches = ev.map_batches(
        lambda b: b.filter(pc.invert(is_p(b))).select(["user_id", "ts", "event_type"]),
        batch_format="pyarrow",
    )
    kinds = grouped_agg(touches, ["event_type"], [("n", "event_type", "count")])
    ktabs = [t for t in ray.get(kinds.to_arrow_refs()) if t.num_columns > 0]
    types = sorted(pa.concat_tables(ktabs).column("event_type").to_pylist())
    type_arr = pa.array(types, pa.string())

    def encode(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b.column("event_type"), value_set=type_arr), pa.int64()
        )
        return pa.table({"user_id": b.column("user_id"), "ts": b.column("ts"),
                         "code": code})

    coded = touches.map_batches(encode, batch_format="pyarrow")
    joined = asof_join_backward(
        purchases, coded,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts", right_value="code",
        left_cols={"user_id": pa.int64(), "ts": pa.timestamp("us"),
                   "value": pa.float64()},
    )

    def to_channel(b: pa.Table) -> pa.Table:
        codes = b.column("code").combine_chunks()
        channel = pc.fill_null(type_arr.take(codes), pa.scalar("(none)"))
        return pa.table({"channel": channel, "value": b.column("value")})

    return grouped_agg(
        joined.map_batches(to_channel, batch_format="pyarrow"),
        ["channel"],
        [("n_purchases", "value", "count"), ("total_value", "value", "sum")],
        round_to=2,
    )


QUERIES["q_purchase_last_touch_attribution"] = q_purchase_last_touch_attribution
ORACLE_SQL["q_purchase_last_touch_attribution"] = """
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts, max(event_type) AS channel
          FROM events WHERE event_type <> 'purchase'
          GROUP BY user_id, ts),
    j AS (SELECT p.value, t.channel
          FROM p ASOF LEFT JOIN t
            ON p.user_id = t.user_id AND p.ts >= t.ts)
    SELECT coalesce(channel, '(none)') AS channel,
           count(*) AS n_purchases, round(sum(value), 2) AS total_value
    FROM j GROUP BY 1
"""


def q_price_pythagorean_means(sf_dir: str):
    """All three Pythagorean means of extended price per return flag —
    arithmetic, geometric (rate-style averaging), harmonic (the right mean
    for ratios/speeds) — in ONE partial-combine pass: Σx, Σln x, Σ1/x and
    the non-null count are all mergeable, so the exchange still ships a
    handful of doubles per group per block."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return b.append_column("__cents", c)

    agg = grouped_agg(
        li.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag"],
        [
            # arithmetic mean from the EXACT integer-cents sum (divided once
            # at the end): a float mean of 2-decimal money can land exactly
            # on a .xx5 boundary where summation order decides the last cent
            ("cents_sum", "__cents", "sum"),
            ("n", "l_extendedprice", "count"),
            ("gmean", "l_extendedprice", "geomean"),
            ("hmean", "l_extendedprice", "harmmean"),
        ],
        round_to=2,
        sum_as_float=False,
    )

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        n = pc.cast(b.column("n"), pa.float64())
        amean = pc.divide(
            pc.divide(pc.cast(b.column("cents_sum"), pa.float64()),
                      pa.scalar(100.0, pa.float64())), n)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "amean": round_like_duckdb(amean, 2),
            "gmean": b.column("gmean"),
            "hmean": b.column("hmean"),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_price_pythagorean_means"] = q_price_pythagorean_means
ORACLE_SQL["q_price_pythagorean_means"] = """
    SELECT l_returnflag,
           round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                 / 100.0 / count(*), 2) AS amean,
           round(exp(avg(ln(l_extendedprice))), 2) AS gmean,
           round(count(l_extendedprice) / sum(1 / l_extendedprice), 2) AS hmean
    FROM lineitem GROUP BY l_returnflag
"""


def _nation_customer_spend(sf_dir: str):
    """Per-customer lifetime spend labeled with the customer's nation —
    the shared preamble of the Gini and HHI concentration queries (one
    partial-combine aggregate + two broadcast dims)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = grouped_agg(orders, ["o_custkey"],
                        [("spend", "o_totalprice", "sum")])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = broadcast_join(cust, nation, left_key="c_nationkey",
                          right_key="n_nationkey", columns=["n_name"])
    return broadcast_join(spend, cust, left_key="o_custkey",
                          right_key="c_custkey", columns=["n_name"])


def q_nation_spend_gini(sf_dir: str):
    """Gini coefficient of customer lifetime spend within each nation —
    the inequality/concentration diagnostic ("do a few whales carry this
    market?").  Spend per customer is one partial-combine aggregate, the
    nation label rides two broadcast dims, and the per-nation coefficient
    is one co-locating exchange + a segmented rank-formula kernel
    (tie-order-invariant, so it matches SQL row_number exactly)."""
    from ..stages.agg import grouped_gini

    spend = _nation_customer_spend(sf_dir)
    return grouped_gini(spend, ["n_name"], "spend", round_to=6)


QUERIES["q_nation_spend_gini"] = q_nation_spend_gini
ORACLE_SQL["q_nation_spend_gini"] = """
    WITH spend AS (
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ), j AS (
        SELECT n_name, spend
        FROM spend
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
    ), r AS (
        SELECT n_name, spend,
               row_number() OVER (PARTITION BY n_name ORDER BY spend) AS i,
               count(*) OVER (PARTITION BY n_name) AS n,
               sum(spend) OVER (PARTITION BY n_name) AS sx
        FROM j
    )
    SELECT n_name,
           round(2.0 * sum(i * spend) / (max(n) * max(sx))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM r GROUP BY n_name
"""


def q_basket_association_rules(sf_dir: str):
    """Market-basket association rules A→B with support / confidence /
    lift (the apriori-style readout): pair counts from the per-order
    co-partition kernel (never a global self-join), min-support cut
    co ≥ 2, both rule directions, per-part basket counts broadcast onto
    the pair stream, top-20 by lift.  Lift is ranked UNROUNDED with a
    deterministic key tiebreak — computed as (co·N)/(n_a·n_c) in the
    exact same double ops as the SQL, so boundary rows agree bitwise."""
    from ..stages.agg import global_topk, grouped_agg, grouped_count_distinct, round_like_duckdb

    counts = _basket_pair_counts(sf_dir)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # total baskets: distinct orders, via the per-order combiner (tiny scalar)
    n_baskets = float(
        grouped_agg(li, ["l_orderkey"], [("c", "l_orderkey", "count")],
                    sum_as_float=False).count()
    )
    nper = grouped_count_distinct(li, ["l_partkey"], "l_orderkey", out_name="n")
    na = nper.map_batches(
        lambda b: pa.table({"ante_key": b.column("l_partkey"),
                            "n_a": b.column("n")}),
        batch_format="pyarrow",
    )
    nc = nper.map_batches(
        lambda b: pa.table({"cons_key": b.column("l_partkey"),
                            "n_c": b.column("n")}),
        batch_format="pyarrow",
    )

    def both_directions(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_orders"), pa.scalar(2)))
        fwd = pa.table({"antecedent": b.column("part_a"),
                        "consequent": b.column("part_b"),
                        "co": b.column("n_orders")})
        rev = pa.table({"antecedent": b.column("part_b"),
                        "consequent": b.column("part_a"),
                        "co": b.column("n_orders")})
        return pa.concat_tables([fwd, rev])

    dirs = counts.map_batches(both_directions, batch_format="pyarrow")
    j = broadcast_join(dirs, na, left_key="antecedent", right_key="ante_key",
                       columns=["n_a"])
    j = broadcast_join(j, nc, left_key="consequent", right_key="cons_key",
                       columns=["n_c"])

    def metrics(b: pa.Table) -> pa.Table:
        co = pc.cast(b.column("co"), pa.float64())
        n_a = pc.cast(b.column("n_a"), pa.float64())
        n_c = pc.cast(b.column("n_c"), pa.float64())
        nn = pa.scalar(n_baskets, pa.float64())
        return pa.table({
            "antecedent": b.column("antecedent"),
            "consequent": b.column("consequent"),
            "co": b.column("co"),
            "support": round_like_duckdb(pc.divide(co, nn), 6),
            "confidence": round_like_duckdb(pc.divide(co, n_a), 6),
            "__lift_raw": pc.divide(pc.multiply(co, nn),
                                    pc.multiply(n_a, n_c)),
        })

    scored = j.map_batches(metrics, batch_format="pyarrow")
    top = global_topk(scored, ["__lift_raw", "antecedent", "consequent"], 20,
                      descending=[True, False, False])

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        lift = round_like_duckdb(b.column("__lift_raw"), 6)
        return b.drop_columns(["__lift_raw"]).append_column("lift", lift)

    return top.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_basket_association_rules"] = q_basket_association_rules
ORACLE_SQL["q_basket_association_rules"] = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT count(DISTINCT l_orderkey) * 1.0 AS nn FROM lineitem),
    n AS (SELECT l_partkey, count(*) AS n FROM op GROUP BY 1),
    p0 AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    dirs AS (
      SELECT pa AS antecedent, pb AS consequent, co FROM p0
      UNION ALL SELECT pb, pa, co FROM p0
    ),
    r AS (
      SELECT antecedent, consequent, co,
             round(co / (SELECT nn FROM nb), 6) AS support,
             round(co / (na.n * 1.0), 6) AS confidence,
             co * (SELECT nn FROM nb) / ((na.n * nc.n) * 1.0) AS lift_raw
      FROM dirs
      JOIN n na ON na.l_partkey = antecedent
      JOIN n nc ON nc.l_partkey = consequent
    )
    SELECT antecedent, consequent, co, support, confidence,
           round(lift_raw, 6) AS lift
    FROM r ORDER BY lift_raw DESC, antecedent, consequent LIMIT 20
"""


def q_doc_bigram_pmi(sf_dir: str):
    """Collocation mining: pointwise mutual information of adjacent token
    bigrams across the corpus, PMI = ln(p(xy)/(p(x)p(y))) with unigram
    probabilities over total tokens W and bigram probability over total
    bigrams B.  Bigrams form inside each document (vectorized
    parent-index shift — no self-join); unigram counts broadcast onto the
    bigram stream; min count n_xy ≥ 5; top-30 ranked by UNROUNDED pmi
    computed in the SQL's exact double-op order so boundary rows agree."""
    from ..stages.agg import global_topk, round_like_duckdb

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        return pa.table({"token": pc.list_flatten(split)})

    def bigrams(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        flat = pc.list_flatten(split).combine_chunks()
        par = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        if len(par) < 2:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string())})
        idx = np.flatnonzero(par[1:] == par[:-1])
        return pa.table({"x": flat.take(pa.array(idx)),
                         "y": flat.take(pa.array(idx + 1))})

    exploded = docs.map_batches(toks, batch_format="pyarrow")
    bg = docs.map_batches(bigrams, batch_format="pyarrow")
    uni = grouped_agg(exploded, ["token"], [("n", "token", "count")],
                      sum_as_float=False).materialize()
    nxy = grouped_agg(bg, ["x", "y"], [("n_xy", "x", "count")],
                      sum_as_float=False).materialize()
    # totals from the (materialized) aggregate tables — the corpus-wide
    # string splits run exactly once, not once per downstream consumer
    w_total = float(uni.sum("n"))
    b_total = float(nxy.sum("n_xy"))
    nx = uni.map_batches(
        lambda b: pa.table({"x_key": b.column("token"), "n_x": b.column("n")}),
        batch_format="pyarrow",
    )
    ny = uni.map_batches(
        lambda b: pa.table({"y_key": b.column("token"), "n_y": b.column("n")}),
        batch_format="pyarrow",
    )
    j = broadcast_join(nxy, nx, left_key="x", right_key="x_key",
                       columns=["n_x"])
    j = broadcast_join(j, ny, left_key="y", right_key="y_key",
                       columns=["n_y"])

    def score(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(pc.cast(b.column("n_xy"), pa.int64()),
                                      pa.scalar(5, pa.int64())))
        co = pc.cast(b.column("n_xy"), pa.float64())
        n_x = pc.cast(b.column("n_x"), pa.float64())
        n_y = pc.cast(b.column("n_y"), pa.float64())
        # ((n_xy·W)·W) / (((B)·n_x)·n_y) — the SQL's left-to-right order
        num = pc.multiply(pc.multiply(co, pa.scalar(w_total)),
                          pa.scalar(w_total))
        den = pc.multiply(pc.multiply(pa.scalar(b_total), n_x), n_y)
        return pa.table({
            "x": b.column("x"),
            "y": b.column("y"),
            "n_xy": pc.cast(b.column("n_xy"), pa.int64()),
            "__pmi_raw": pc.ln(pc.divide(num, den)),
        })

    scored = j.map_batches(score, batch_format="pyarrow")
    top = global_topk(scored, ["__pmi_raw", "x", "y"], 30,
                      descending=[True, False, False])

    def finalize(b: pa.Table) -> pa.Table:
        pmi = round_like_duckdb(b.column("__pmi_raw"), 6)
        return b.drop_columns(["__pmi_raw"]).append_column("pmi", pmi)

    return top.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_doc_bigram_pmi"] = q_doc_bigram_pmi
ORACLE_SQL["q_doc_bigram_pmi"] = """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ls FROM documents),
    toks AS (SELECT unnest(ls) AS token FROM d),
    bgs AS (
        SELECT ls[i] AS x, ls[i + 1] AS y
        FROM d, UNNEST(range(1, len(ls))) AS t(i)
    ),
    uni AS (SELECT token, count(*) AS n FROM toks GROUP BY 1),
    w AS (SELECT count(*) * 1.0 AS w FROM toks),
    bt AS (SELECT count(*) * 1.0 AS b FROM bgs),
    nxy AS (SELECT x, y, count(*) AS n_xy FROM bgs GROUP BY 1, 2
            HAVING count(*) >= 5),
    r AS (
        SELECT x, y, n_xy,
               ln(n_xy * 1.0 * (SELECT w FROM w) * (SELECT w FROM w)
                  / ((SELECT b FROM bt) * nx.n * ny.n)) AS pmi_raw
        FROM nxy
        JOIN uni nx ON nx.token = x
        JOIN uni ny ON ny.token = y
    )
    SELECT x, y, n_xy, round(pmi_raw, 6) AS pmi
    FROM r ORDER BY pmi_raw DESC, x, y LIMIT 30
"""


def q_click_purchase_value_ks(sf_dir: str):
    """Distribution-shift test: exact two-sample Kolmogorov–Smirnov
    statistic between click and purchase event values — distinct-value
    combiner → range sort → two global prefix sums → vectorized sup
    |F₁−F₂| (never collects a sample; the drift-detection shape for
    monitoring feature distributions at scale)."""
    from ..stages.agg import ks_two_sample

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return ks_two_sample(ev, "value", "event_type", "click", "purchase")


QUERIES["q_click_purchase_value_ks"] = q_click_purchase_value_ks
ORACLE_SQL["q_click_purchase_value_ks"] = """
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    g AS (SELECT value, sum(i1) AS c1, sum(i2) AS c2 FROM s GROUP BY 1),
    t AS (SELECT sum(c1) * 1.0 AS n1, sum(c2) * 1.0 AS n2 FROM g),
    c AS (
        SELECT value,
               sum(c1) OVER (ORDER BY value) AS f1,
               sum(c2) OVER (ORDER BY value) AS f2
        FROM g
    )
    SELECT value AS at_value,
           round(abs(f1 / (SELECT n1 FROM t) - f2 / (SELECT n2 FROM t)), 6)
               AS ks_d
    FROM c
    ORDER BY abs(f1 / (SELECT n1 FROM t) - f2 / (SELECT n2 FROM t)) DESC,
             value
    LIMIT 1
"""


def q_nation_spend_hhi(sf_dir: str):
    """Herfindahl-Hirschman concentration index of customer spend within
    each nation — HHI = Σshare² = Σx²/(Σx)², so unlike the rank-based
    Gini it needs NO in-group sort: per-customer spend is one
    partial-combine pass, then Σx and Σx² are both mergeable sums and the
    index plus its reciprocal (the "effective number of customers")
    finalize per group after one tiny exchange."""
    spend = _nation_customer_spend(sf_dir)

    def square(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("spend"), pa.float64())
        return pa.table({"n_name": b.column("n_name"), "spend": s,
                         "spend2": pc.multiply(s, s)})

    sq = spend.map_batches(square, batch_format="pyarrow")
    agg = grouped_agg(sq, ["n_name"], [("s", "spend", "sum"),
                                       ("s2", "spend2", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        from ..stages.agg import round_like_duckdb

        s = b.column("s")
        hhi = pc.divide(b.column("s2"), pc.multiply(s, s))
        return pa.table({
            "n_name": b.column("n_name"),
            "hhi": round_like_duckdb(hhi, 6),
            "effective_n": round_like_duckdb(
                pc.divide(pa.scalar(1.0, pa.float64()), hhi), 2),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_nation_spend_hhi"] = q_nation_spend_hhi
ORACLE_SQL["q_nation_spend_hhi"] = """
    WITH spend AS (
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ), j AS (
        SELECT n_name, spend
        FROM spend
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
    )
    SELECT n_name,
           round(sum(spend * spend) / (sum(spend) * sum(spend)), 6) AS hhi,
           round(1.0 / (sum(spend * spend) / (sum(spend) * sum(spend))), 2)
               AS effective_n
    FROM j GROUP BY n_name
"""


def q_customer_priority_scd2(sf_dir: str):
    """SCD-type-2 dimension-history build: each customer's order-priority
    regime as validity intervals — consecutive equal priorities collapse,
    ``valid_to`` NULL + ``is_current`` on the open last regime.  One keyed
    exchange + a single segmented change-detect/close kernel (the
    warehouse history-table shape, vs the SQL lag-filter + lead-close
    two-window build)."""
    from ..stages.window import scd2_intervals

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate",
                    "o_orderpriority"])
    return scd2_intervals(orders, key="o_custkey", order_col="o_orderdate",
                          tiebreak="o_orderkey", attr_col="o_orderpriority")


QUERIES["q_customer_priority_scd2"] = q_customer_priority_scd2
ORACLE_SQL["q_customer_priority_scd2"] = """
    WITH s AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
               lag(o_orderpriority) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ),
    ch AS (
        SELECT * FROM s WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey, o_orderpriority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM ch
"""


def q_doc_bm25(sf_dir: str):
    """BM25 keyword ranking (k1=1.2, b=0.75) for a fixed 3-term query —
    the full-text-search scoring shape: the token stream is pruned to the
    query terms MAP-SIDE (only matching (doc, term) pairs ever reach an
    exchange), document lengths ride a co-partitioned join, the 3-row
    df/idf table broadcasts, and ranking uses the ROUNDED score with a
    doc_id tiebreak so per-doc float summation order can't flip the
    boundary.  Every arithmetic step mirrors the SQL's parse order
    double-for-double."""
    from ..stages.agg import round_like_duckdb

    terms = ["join", "stream", "filter"]
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = float(docs.count())

    def toks(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        ids = pc.list_parent_indices(split)
        return pa.table({"doc_id": b.column("doc_id").take(ids),
                         "token": pc.list_flatten(split)})

    exploded = docs.map_batches(toks, batch_format="pyarrow")
    doclen = grouped_agg(exploded, ["doc_id"], [("len", "token", "count")],
                         sum_as_float=False)
    avglen = float(doclen.sum("len")) / n_docs

    def only_terms(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("token"),
                                 value_set=pa.array(terms)))

    qtf = grouped_agg(exploded.map_batches(only_terms, batch_format="pyarrow"),
                      ["doc_id", "token"], [("tf", "token", "count")],
                      sum_as_float=False)
    df = grouped_agg(qtf, ["token"], [("df", "token", "count")],
                     sum_as_float=False)
    df = df.map_batches(
        lambda b: pa.table({"t_key": b.column("token"),
                            "df": pc.cast(b.column("df"), pa.int64())}),
        batch_format="pyarrow",
    )
    j = broadcast_join(qtf, df, left_key="token", right_key="t_key",
                       columns=["df"])
    j = hash_join(j, doclen, left_key="doc_id", num_partitions=8)

    def score(b: pa.Table) -> pa.Table:
        tf = pc.cast(b.column("tf"), pa.float64())
        dfv = pc.cast(b.column("df"), pa.float64())
        ln_ = pc.cast(b.column("len"), pa.float64())
        n = pa.scalar(n_docs, pa.float64())
        half = pa.scalar(0.5, pa.float64())
        idf = pc.ln(pc.add(
            pa.scalar(1.0, pa.float64()),
            pc.divide(pc.add(pc.subtract(n, dfv), half), pc.add(dfv, half)),
        ))
        # 0.25 + 0.75 * len / avglen  (SQL parse order)
        norm = pc.add(
            pa.scalar(0.25, pa.float64()),
            pc.divide(pc.multiply(pa.scalar(0.75, pa.float64()), ln_),
                      pa.scalar(avglen, pa.float64())),
        )
        den = pc.add(tf, pc.multiply(pa.scalar(1.2, pa.float64()), norm))
        st = pc.divide(
            pc.multiply(idf, pc.multiply(tf, pa.scalar(2.2, pa.float64()))),
            den,
        )
        return pa.table({"doc_id": b.column("doc_id"), "st": st})

    scored = j.map_batches(score, batch_format="pyarrow")
    per_doc = grouped_agg(scored, ["doc_id"], [("bm25", "st", "sum")],
                          round_to=6)
    return global_topk(per_doc, ["bm25", "doc_id"], 10,
                       descending=[True, False])


QUERIES["q_doc_bm25"] = q_doc_bm25
ORACLE_SQL["q_doc_bm25"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
    st AS (SELECT (SELECT count(*) FROM documents) * 1.0 AS n,
                  (SELECT sum(len) FROM dl)
                      / ((SELECT count(*) FROM documents) * 1.0) AS avglen),
    qtf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('join', 'stream', 'filter') GROUP BY 1, 2
    ),
    df AS (SELECT token, count(*) AS df FROM qtf GROUP BY 1),
    sc AS (
        SELECT doc_id,
               sum(ln(1 + ((SELECT n FROM st) - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (0.25 + 0.75 * len
                                  / (SELECT avglen FROM st)))) AS score
        FROM qtf JOIN df USING (token) JOIN dl USING (doc_id)
        GROUP BY 1
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM sc ORDER BY round(score, 6) DESC, doc_id LIMIT 10
"""


# Upgrade q_events_value_ewma from rows-only to a full oracle: the
# recurrence y_i = (1-a)·y_{i-1} + a·x_i IS SQL-expressible as a recursive
# CTE stepping on per-user row_number (depth = the longest per-user series,
# ≤ ~100 at these scales).  The engine's closed-form kernel differs from
# the sequential op order only below the round-6 output precision (pinned
# vs pandas by test_ewma_matches_pandas).
ORACLE_SQL["q_events_value_ewma"] = """
    WITH RECURSIVE s AS (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT event_id, user_id, rn, value * 1.0 AS y FROM s WHERE rn = 1
        UNION ALL
        SELECT s.event_id, s.user_id, s.rn,
               (1 - 0.3) * r.y + 0.3 * s.value
        FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT event_id, user_id, round(y, 6) AS value_ewma FROM r
"""
def q_supply_kcore(sf_dir: str):
    """3-core of the bipartite supplier-part supply graph: iteratively
    peel suppliers/parts with fewer than 3 distinct counterparties until
    the dense backbone remains (the denoising filter before clustering a
    dedup/similarity graph).  Rows-only: fixpoint deletion has no
    recursive-CTE formulation; the peel is pinned == a sequential
    reference by `test_kcore_brute_force`."""
    from ..stages.graph import kcore

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    return kcore(li, src="l_suppkey", dst="l_partkey", k=3)


QUERIES["q_supply_kcore"] = q_supply_kcore


def q_orders_profile(sf_dir: str):
    """Dataset profiling report over five orders columns — row count, NULL
    count, exact distinct count, numeric min/max per column in long
    format.  Rows/NULLs/min/max fold in ONE partial pass; each exact
    distinct count is a distinct-value combiner pipeline (the "profile the
    table before building on it" shape)."""
    from ..stages.validate import profile_table

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
            "o_orderpriority"]
    orders = _read(sf_dir, "orders", cols)
    return profile_table(orders, cols, round_to=2)


QUERIES["q_orders_profile"] = q_orders_profile
ORACLE_SQL["q_orders_profile"] = """
    SELECT 'o_orderkey' AS column, count(*) AS n,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           round(min(o_orderkey) * 1.0, 2) AS min_num,
           round(max(o_orderkey) * 1.0, 2) AS max_num FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           round(min(o_custkey) * 1.0, 2), round(max(o_custkey) * 1.0, 2)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), NULL, NULL FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL FROM orders
"""


def q_part_abc_classes(sf_dir: str):
    """ABC / Pareto inventory classification: parts ranked by revenue,
    classified A (cumulative share ≤ 80%), B (≤ 95%), C (rest), then a
    per-class rollup — range sort (global block order) + one global
    prefix-sum pass instead of a single-node window, so the classification
    scales with partitions.  Cumulative shares are computed in the SQL's
    exact double order (same running-sum sequence), so class boundaries
    agree row-for-row."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice",
                                    "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0, pa.float64()),
                        b.column("l_discount")),
        )
        return pa.table({"l_partkey": b.column("l_partkey"), "r": r})

    per_part = grouped_agg(li.map_batches(rev, batch_format="pyarrow"),
                           ["l_partkey"], [("revenue", "r", "sum")])
    total = float(per_part.sum("revenue"))
    s = range_sort(per_part, "revenue", descending=True,
                   tiebreak=["l_partkey"])
    s = global_prefix_sums(s, "revenue", out_name="__cum", exclusive=False)

    def classify(b: pa.Table) -> pa.Table:
        share = pc.divide(b.column("__cum"),
                          pa.scalar(total, pa.float64()))
        cls = pc.if_else(
            pc.less_equal(share, pa.scalar(0.8, pa.float64())),
            pa.scalar("A"),
            pc.if_else(pc.less_equal(share, pa.scalar(0.95, pa.float64())),
                       pa.scalar("B"), pa.scalar("C")),
        )
        return pa.table({"abc": cls, "revenue": b.column("revenue")})

    classed = s.map_batches(classify, batch_format="pyarrow")
    out = grouped_agg(classed, ["abc"], [("n_parts", "revenue", "count"),
                                         ("class_revenue", "revenue", "sum")],
                      sum_as_float=False)
    return out.map_batches(
        lambda b: pa.table({
            "abc": b.column("abc"),
            "n_parts": pc.cast(b.column("n_parts"), pa.int64()),
            "class_revenue": round_like_duckdb(
                pc.cast(b.column("class_revenue"), pa.float64()), 2),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_part_abc_classes"] = q_part_abc_classes
ORACLE_SQL["q_part_abc_classes"] = """
    WITH pr AS (
        SELECT l_partkey,
               sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT sum(revenue) AS total FROM pr),
    c AS (
        SELECT revenue,
               sum(revenue) OVER (ORDER BY revenue DESC, l_partkey)
                   / (SELECT total FROM t) AS share
        FROM pr
    )
    SELECT CASE WHEN share <= 0.8 THEN 'A'
                WHEN share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
           count(*) AS n_parts,
           round(sum(revenue), 2) AS class_revenue
    FROM c GROUP BY 1
"""


def q_purchase_calibration_curve(sf_dir: str):
    """Model-calibration readout (reliability diagram): treating each
    event's value as a pseudo-score for "is this a purchase", bucket
    scores into 10 fixed-width bins and report mean score vs observed
    positive rate per bin — binning, the indicator, and both means are all
    map-side partials on ONE combiner exchange (the ML-eval companion to
    the ROC-AUC queries)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value")
        # fixed-width bins over [0, 100): floor(v/10) clamped to 9
        bin_ = pc.cast(pc.floor(pc.divide(v, pa.scalar(10.0, pa.float64()))),
                       pa.int64())
        bin_ = pc.min_element_wise(pc.max_element_wise(
            bin_, pa.scalar(0, pa.int64())), pa.scalar(9, pa.int64()))
        y = pc.cast(pc.equal(b.column("event_type"), pa.scalar("purchase")),
                    pa.int64())
        return pa.table({"bin": bin_, "score": v, "y": y})

    proj = ev.map_batches(project, batch_format="pyarrow")
    agg = grouped_agg(proj, ["bin"], [
        ("n", "score", "count"),
        ("mean_score", "score", "mean"),
        ("positive_rate", "y", "mean"),
    ], round_to=6)
    return agg.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("n"), "n",
                               pc.cast(b.column("n"), pa.int64())),
        batch_format="pyarrow",
    )


QUERIES["q_purchase_calibration_curve"] = q_purchase_calibration_curve
ORACLE_SQL["q_purchase_calibration_curve"] = """
    WITH s AS (
        SELECT least(greatest(CAST(floor(value / 10.0) AS BIGINT), 0), 9)
                   AS bin,
               value AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    )
    SELECT bin, count(score) AS n,
           round(avg(score), 6) AS mean_score,
           round(avg(y * 1.0), 6) AS positive_rate
    FROM s GROUP BY bin
"""


def _epoch_week(ts_col):
    """Integer epoch week of a timestamp column (shared bucketing used by
    the retention / trending / LTV / growth weekly queries; SQL mirror:
    ``epoch_us(ts) // 604800000000``)."""
    return pc.divide(pc.cast(ts_col, pa.int64()),
                     pa.scalar(604_800_000_000, pa.int64()))


def q_weekly_trending_types(sf_dir: str):
    """Trending report: weekly event-type ranks (by count, deterministic
    name tiebreak) with each type's rank movement vs the PREVIOUS week —
    the leaderboard-delta shape.  Counts are one combiner exchange; the
    per-week ranking is a keyed running row_number over negated count;
    last week's rank comes back via a broadcast self-join on (week−1,
    type) — the small aggregate table moves, never the event stream."""
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def week_of(b: pa.Table) -> pa.Table:
        return pa.table({"week": _epoch_week(b.column("ts")),
                         "event_type": b.column("event_type")})

    weeks = ev.map_batches(week_of, batch_format="pyarrow")
    counts = grouped_agg(weeks, ["week", "event_type"],
                         [("n", "event_type", "count")], sum_as_float=False)

    def neg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__neg_n", pc.multiply(pc.cast(b.column("n"), pa.int64()),
                                   pa.scalar(-1, pa.int64())))

    ranked = grouped_running(
        counts.map_batches(neg, batch_format="pyarrow"),
        key="week", order_col="__neg_n", value_col="__neg_n",
        kinds=[("rank", "row_number")], tiebreak="event_type",
    )

    def clean(b: pa.Table) -> pa.Table:
        return pa.table({
            "week": b.column("week"),
            "event_type": b.column("event_type"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "rank": pc.cast(b.column("rank"), pa.int64()),
        })

    ranked = ranked.map_batches(clean, batch_format="pyarrow")

    def with_key(week_col: str, shift: int):
        def f(b: pa.Table) -> pa.Table:
            wk = pc.add(b.column(week_col), pa.scalar(shift, pa.int64()))
            k = pc.binary_join_element_wise(
                pc.cast(wk, pa.string()), b.column("event_type"), "|")
            return b.append_column("__k" if shift == 0 else "__pk",
                                   k)
        return f

    keyed = ranked.map_batches(with_key("week", 0), batch_format="pyarrow")
    prev = ranked.map_batches(with_key("week", 1), batch_format="pyarrow")
    prev = prev.map_batches(
        lambda b: pa.table({"__pk": b.column("__pk"),
                            "prev_rank": b.column("rank")}),
        batch_format="pyarrow",
    )
    j = broadcast_join(keyed, prev, left_key="__k", right_key="__pk",
                       columns=["prev_rank"], how="left outer")

    def delta(b: pa.Table) -> pa.Table:
        d = pc.subtract(b.column("prev_rank"), b.column("rank"))
        return pa.table({
            "week": b.column("week"),
            "event_type": b.column("event_type"),
            "n": b.column("n"),
            "rank": b.column("rank"),
            "rank_delta": d,
        })

    return j.map_batches(delta, batch_format="pyarrow")


QUERIES["q_weekly_trending_types"] = q_weekly_trending_types
ORACLE_SQL["q_weekly_trending_types"] = """
    WITH w AS (
        SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               event_type
        FROM events
    ),
    c AS (SELECT week, event_type, count(*) AS n FROM w GROUP BY 1, 2),
    r AS (
        SELECT week, event_type, n,
               row_number() OVER (PARTITION BY week
                                  ORDER BY n DESC, event_type) AS rank
        FROM c
    )
    SELECT r.week, r.event_type, r.n, r.rank,
           p.rank - r.rank AS rank_delta
    FROM r LEFT JOIN r p
      ON p.week = r.week - 1 AND p.event_type = r.event_type
"""


def q_cohort_ltv_curve(sf_dir: str):
    """Cohort LTV curve: cumulative event value per cohort USER by week
    offset — the "how much is a week-N user worth so far" readout.
    First-activity week is a keyed MIN broadcast back over the stream
    (users ≪ events); per-(cohort, offset) value sums are one combiner
    exchange; the running accumulation is a keyed cumsum over the TINY
    cell table; cohort sizes ride a second small broadcast."""
    from ..stages.agg import grouped_count_distinct, round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def week_of(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "week": _epoch_week(b.column("ts")),
                         "value": b.column("value")})

    weeks = ev.map_batches(week_of, batch_format="pyarrow")
    first = grouped_agg(weeks, ["user_id"],
                        [("cohort_week", "week", "min")]).materialize()
    withc = broadcast_join(weeks, first, left_key="user_id",
                           right_key="user_id", columns=["cohort_week"])

    def offset(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": b.column("cohort_week"),
            "week_offset": pc.subtract(b.column("week"),
                                       b.column("cohort_week")),
            "value": b.column("value"),
        })

    cells = grouped_agg(
        withc.map_batches(offset, batch_format="pyarrow"),
        ["cohort_week", "week_offset"], [("v", "value", "sum")],
    )
    run = grouped_running(cells, key="cohort_week", order_col="week_offset",
                          value_col="v", kinds=[("cum_v", "cumsum")])
    sizes = grouped_count_distinct(first, ["cohort_week"], "user_id",
                                   out_name="cohort_users")
    j = broadcast_join(run, sizes, left_key="cohort_week",
                       right_key="cohort_week", columns=["cohort_users"])

    def finalize(b: pa.Table) -> pa.Table:
        ltv = pc.divide(b.column("cum_v"),
                        pc.cast(b.column("cohort_users"), pa.float64()))
        return pa.table({
            "cohort_week": b.column("cohort_week"),
            "week_offset": b.column("week_offset"),
            "cohort_users": pc.cast(b.column("cohort_users"), pa.int64()),
            "ltv_per_user": round_like_duckdb(ltv, 6),
        })

    return j.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_cohort_ltv_curve"] = q_cohort_ltv_curve
ORACLE_SQL["q_cohort_ltv_curve"] = """
    WITH w AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               value
        FROM events
    ),
    f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
    cells AS (
        SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
               sum(w.value) AS v
        FROM w JOIN f ON w.user_id = f.user_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT cohort_week, count(*) AS cohort_users FROM f GROUP BY 1)
    SELECT c.cohort_week, c.week_offset, sz.cohort_users,
           round(sum(c.v) OVER (PARTITION BY c.cohort_week
                                ORDER BY c.week_offset)
                 / sz.cohort_users, 6) AS ltv_per_user
    FROM cells c JOIN sz USING (cohort_week)
"""


def _user_lifetime_death_table(sf_dir: str):
    """Shared preamble of the Kaplan-Meier survival and Nelson-Aalen
    hazard queries: per-user lifetime days (one keyed aggregate,
    materialized once so the total-count action does not re-run it),
    per-day death counts (one combiner exchange), range-sorted with the
    exclusive at-risk prefix sum in ``__before``.  Returns
    ``(sorted_deaths_ds, total_users)``."""
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    life = grouped_agg(ev, ["user_id"], [("first_ts", "ts", "min"),
                                         ("last_ts", "ts", "max")])

    def days_of(b: pa.Table) -> pa.Table:
        us0 = pc.cast(b.column("first_ts"), pa.int64())
        us1 = pc.cast(b.column("last_ts"), pa.int64())
        d = pc.divide(pc.subtract(us1, us0),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"days": d})

    lifetimes = life.map_batches(days_of, batch_format="pyarrow").materialize()
    total = float(lifetimes.count())
    deaths = grouped_agg(lifetimes, ["days"], [("d_events", "days", "count")],
                         sum_as_float=False)
    s = range_sort(deaths, "days")
    s = global_prefix_sums(s, "d_events", out_name="__before",
                           exclusive=True)
    return s, total


def q_user_lifetime_km(sf_dir: str):
    """Kaplan-Meier survival curve over user lifetimes (days between first
    and last activity; every user an observed event, no censoring in this
    data): S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) — the retention-survival staple.
    Distributed exactly: per-user lifetime is one keyed aggregate, the
    per-time death counts one combiner exchange, and BOTH running terms
    (at-risk nᵢ via an exclusive prefix sum, Σln(1−d/n) via an inclusive
    one) ride `range_sort` + `global_prefix_sums` — no single-node window.
    The ln/exp/divide sequence matches the SQL's double ops, so the curve
    is cell-exact."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_prefix_sums

    s, total = _user_lifetime_death_table(sf_dir)

    def factor(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("d_events"), pa.float64())
        n = pc.subtract(pa.scalar(total, pa.float64()),
                        b.column("__before"))
        f = pc.subtract(pa.scalar(1.0, pa.float64()), pc.divide(d, n))
        lnf = pc.if_else(pc.greater(f, pa.scalar(0.0, pa.float64())),
                         pc.ln(pc.max_element_wise(
                             f, pa.scalar(1e-300, pa.float64()))),
                         pa.scalar(0.0, pa.float64()))
        return pa.table({
            "days": b.column("days"),
            "n_at_risk": pc.cast(n, pa.int64()),
            "d_events": pc.cast(b.column("d_events"), pa.int64()),
            "__f": f,
            "__lnf": lnf,
        })

    s2 = s.map_batches(factor, batch_format="pyarrow")
    s2 = global_prefix_sums(s2, "__lnf", out_name="__lnsum",
                            exclusive=False)

    def finalize(b: pa.Table) -> pa.Table:
        surv = pc.if_else(
            pc.equal(b.column("__f"), pa.scalar(0.0, pa.float64())),
            pa.scalar(0.0, pa.float64()),
            pc.exp(b.column("__lnsum")),
        )
        return pa.table({
            "days": b.column("days"),
            "n_at_risk": b.column("n_at_risk"),
            "d_events": b.column("d_events"),
            "survival": round_like_duckdb(surv, 6),
        })

    return s2.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_lifetime_km"] = q_user_lifetime_km
ORACLE_SQL["q_user_lifetime_km"] = """
    WITH l AS (
        SELECT user_id,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                    // 86400000000 AS BIGINT) AS days
        FROM events GROUP BY user_id
    ),
    t AS (SELECT count(*) * 1.0 AS total FROM l),
    d AS (SELECT days, count(*) AS d_events FROM l GROUP BY days),
    c AS (
        SELECT days, d_events,
               (SELECT total FROM t)
                   - coalesce(sum(d_events) OVER (ORDER BY days
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
        FROM d
    ),
    f AS (
        SELECT days, d_events, n,
               1.0 - d_events * 1.0 / n AS f
        FROM c
    )
    SELECT days, CAST(n AS BIGINT) AS n_at_risk,
           d_events,
           CASE WHEN f = 0 THEN 0.0
                ELSE round(exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0 END)
                               OVER (ORDER BY days)), 6)
           END AS survival
    FROM f
"""


def q_event_type_ucb(sf_dir: str):
    """Multi-armed-bandit readout: per event-type ("arm") mean reward and
    UCB1 upper confidence bound mean + √(2·ln N / n) — the
    explore/exploit priority score, entirely from ONE mergeable combiner
    pass (n, Σx per arm) plus the global-N scalar; the bound's double ops
    mirror the SQL exactly."""
    from ..stages.agg import round_like_duckdb

    ev = _read(sf_dir, "events", ["event_type", "value"])
    ev = ev.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow",
    )  # a "pull" is an event WITH a reward — keeps mean undiluted if NULLs appear
    n_total = float(ev.count())
    agg = grouped_agg(ev, ["event_type"], [("n", "value", "count"),
                                           ("mean_reward", "value", "mean")],
                      round_to=None)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        bonus = pc.sqrt(pc.divide(
            pc.multiply(pa.scalar(2.0, pa.float64()),
                        pa.scalar(np.log(n_total), pa.float64())),
            n))
        return pa.table({
            "event_type": b.column("event_type"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "mean_reward": round_like_duckdb(b.column("mean_reward"), 6),
            "ucb1": round_like_duckdb(
                pc.add(b.column("mean_reward"), bonus), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_event_type_ucb"] = q_event_type_ucb
ORACLE_SQL["q_event_type_ucb"] = """
    WITH e AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL),
    t AS (SELECT count(*) * 1.0 AS n_total FROM e)
    SELECT event_type, count(*) AS n,
           round(avg(value), 6) AS mean_reward,
           round(avg(value)
                 + sqrt(2.0 * ln((SELECT n_total FROM t)) / count(*)), 6)
               AS ucb1
    FROM e GROUP BY event_type
"""


def _purchase_touch_pairs(sf_dir: str, *, carry_purchase_ts: bool = False):
    """(purchase × preceding-touch) pairs within 7 days, strictly before
    the purchase — the shared interval-join preamble of the U-shaped and
    time-decay attribution queries.  ``carry_purchase_ts`` also carries
    the purchase timestamp (``w_end``) for recency weighting."""
    from ..stages.joins import interval_join

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    week_us = 7 * 86_400 * 1_000_000

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), pa.scalar("purchase")))
        pts = pc.cast(b.column("ts"), pa.int64())
        return pa.table({
            "pid": b.column("event_id"),
            "user_id": b.column("user_id"),
            "w_start": pc.subtract(pts, pa.scalar(week_us, pa.int64())),
            "w_end": pts,
            "value": b.column("value"),
        })

    def touches(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("event_type"),
                                  pa.scalar("purchase")))
        return pa.table({
            "user_id": b.column("user_id"),
            "tts": pc.cast(b.column("ts"), pa.int64()),
            "tid": b.column("event_id"),
            "channel": b.column("event_type"),
        })

    left_cols = {"pid": pa.int64(), "value": pa.float64()}
    if carry_purchase_ts:
        left_cols["w_end"] = pa.int64()
    return interval_join(
        ev.map_batches(purchases, batch_format="pyarrow"),
        ev.map_batches(touches, batch_format="pyarrow"),
        left_key="user_id", right_key="user_id",
        start_col="w_start", end_col="w_end", right_ts="tts",
        right_cols={"tts": pa.int64(), "tid": pa.int64(),
                    "channel": pa.string()},
        left_cols=left_cols,
    )


def q_purchase_position_attribution(sf_dir: str):
    """Position-based (U-shaped) multi-touch attribution: every purchase's
    revenue splits 40% to the first touch, 40% to the last, 20% spread
    over the middles (k=1 → 100%, k=2 → 50/50) across the 7 days strictly
    before the purchase.  The purchase×touch pairs come from the
    co-partitioned interval join (searchsorted band per user — never a
    global cross join); per-purchase weights are one segmented kernel;
    channel credit is one combiner exchange.  Credit is rounded at 6dp —
    exact-decimal credits (0.4/0.5/0.25·2dp money) sum to ≤5dp decimals,
    which can sit exactly ON a 2dp rounding boundary but never on a 6dp
    one, so the oracle compare is deterministic."""
    from ..stages.agg import grouped_map, round_like_duckdb

    pairs = _purchase_touch_pairs(sf_dir)

    empty = pa.table({"channel": pa.array([], pa.string()),
                      "credit": pa.array([], pa.float64())})

    def weights_part(t: pa.Table) -> pa.Table:
        from ..stages.agg import _key_run_bounds

        if t.num_rows == 0:
            return empty
        t = t.sort_by([("pid", "ascending"), ("tts", "ascending"),
                       ("tid", "ascending")])
        bounds = _key_run_bounds(t, ["pid"])
        sizes = np.diff(bounds)
        k = np.repeat(sizes, sizes).astype(np.float64)
        pos = (np.arange(t.num_rows)
               - np.repeat(bounds[:-1], sizes) + 1).astype(np.float64)
        w = np.where(
            k == 1, 1.0,
            np.where(k == 2, 0.5,
                     np.where((pos == 1) | (pos == k), 0.4,
                              0.2 / np.maximum(k - 2, 1.0))))
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"channel": t.column("channel"),
                         "credit": pa.array(v * w, pa.float64())})

    credits = grouped_map(pairs, "pid", weights_part, per_group=False,
                          empty_schema=pa.table({
                              "pid": pa.array([], pa.int64()),
                              "tts": pa.array([], pa.int64()),
                              "tid": pa.array([], pa.int64()),
                              "channel": pa.array([], pa.string()),
                              "value": pa.array([], pa.float64()),
                          }))
    out = grouped_agg(credits, ["channel"],
                      [("n_touches", "credit", "count"),
                       ("credited_value", "credit", "sum")],
                      round_to=6, sum_as_float=True)
    return out.map_batches(
        lambda b: pa.table({
            "channel": b.column("channel"),
            "n_touches": pc.cast(b.column("n_touches"), pa.int64()),
            "credited_value": b.column("credited_value"),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_purchase_position_attribution"] = q_purchase_position_attribution
ORACLE_SQL["q_purchase_position_attribution"] = """
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    m AS (
        SELECT pid, value, channel,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY tts, tid) AS rn,
               count(*) OVER (PARTITION BY pid) AS k
        FROM p JOIN t ON t.user_id = p.user_id
          AND t.tts >= p.pts - INTERVAL 7 DAY AND t.tts < p.pts
    )
    SELECT channel, count(*) AS n_touches,
           round(sum(value * (CASE WHEN k = 1 THEN 1.0
                                   WHEN k = 2 THEN 0.5
                                   WHEN rn = 1 OR rn = k THEN 0.4
                                   ELSE 0.2 / (k - 2) END)), 6)
               AS credited_value
    FROM m GROUP BY channel
"""


def q_purchase_time_decay_attribution(sf_dir: str):
    """Time-decay multi-touch attribution: each purchase's revenue splits
    over its 7-day touch path with exponential half-life weights
    2^(−Δt/1day), normalized per purchase — recency-weighted credit, the
    third attribution flavor next to last-touch and U-shaped.  Same
    co-partitioned interval join; the per-purchase normalization is a
    segmented two-pass (sum of weights, then divide) — and both engines
    evaluate the identical power/divide double sequence."""
    from ..stages.agg import grouped_map, round_like_duckdb

    day_us = 86_400 * 1_000_000.0
    pairs = _purchase_touch_pairs(sf_dir, carry_purchase_ts=True)

    empty = pa.table({"channel": pa.array([], pa.string()),
                      "credit": pa.array([], pa.float64())})

    def weights_part(t: pa.Table) -> pa.Table:
        from ..stages.agg import _key_run_bounds

        if t.num_rows == 0:
            return empty
        t = t.sort_by([("pid", "ascending"), ("tts", "ascending"),
                       ("tid", "ascending")])
        bounds = _key_run_bounds(t, ["pid"])
        sizes = np.diff(bounds)
        pts = t.column("w_end").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tts = t.column("tts").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # 2^(−Δdays): identical to SQL power(2.0, −Δus/86400e6)
        w = np.power(2.0, -((pts - tts) / day_us))
        wsum = np.repeat(np.add.reduceat(w, bounds[:-1]), sizes)
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"channel": t.column("channel"),
                         "credit": pa.array(v * (w / wsum), pa.float64())})

    credits = grouped_map(pairs, "pid", weights_part, per_group=False,
                          empty_schema=pa.table({
                              "pid": pa.array([], pa.int64()),
                              "value": pa.array([], pa.float64()),
                              "w_end": pa.array([], pa.int64()),
                              "tts": pa.array([], pa.int64()),
                              "tid": pa.array([], pa.int64()),
                              "channel": pa.array([], pa.string()),
                          }))
    out = grouped_agg(credits, ["channel"],
                      [("n_touches", "credit", "count"),
                       ("credited_value", "credit", "sum")],
                      round_to=6, sum_as_float=True)
    return out.map_batches(
        lambda b: pa.table({
            "channel": b.column("channel"),
            "n_touches": pc.cast(b.column("n_touches"), pa.int64()),
            "credited_value": b.column("credited_value"),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_purchase_time_decay_attribution"] = (
    q_purchase_time_decay_attribution)
ORACLE_SQL["q_purchase_time_decay_attribution"] = """
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    m AS (
        SELECT pid, value, channel,
               power(2.0, -((epoch_us(pts) - epoch_us(tts))
                            / 86400000000.0)) AS w
        FROM p JOIN t ON t.user_id = p.user_id
          AND t.tts >= p.pts - INTERVAL 7 DAY AND t.tts < p.pts
    ),
    n AS (
        SELECT pid, value, channel, w,
               sum(w) OVER (PARTITION BY pid) AS wsum
        FROM m
    )
    SELECT channel, count(*) AS n_touches,
           round(sum(value * (w / wsum)), 6) AS credited_value
    FROM n GROUP BY channel
"""


def q_supplier_degree_powerlaw(sf_dir: str):
    """Power-law exponent of the supplier degree distribution (continuous
    MLE, k_min = 1): α = 1 + n/Σln(kᵢ) — the scale-free-network
    diagnostic over the bipartite supply graph.  Degrees are one exact
    count-distinct exchange; the MLE folds map-side (Σln k and n are both
    mergeable sums) into a single scalar row."""
    from ..stages.agg import grouped_count_distinct, round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    deg = grouped_count_distinct(li, ["l_suppkey"], "l_partkey",
                                 out_name="k")

    def lnk(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column("k"), pa.float64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "lnk": pc.ln(k),
        })

    agg = grouped_agg(deg.map_batches(lnk, batch_format="pyarrow"),
                      ["__g"], [("n", "lnk", "count"),
                                ("s", "lnk", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        alpha = pc.add(pa.scalar(1.0, pa.float64()),
                       pc.divide(n, b.column("s")))
        return pa.table({
            "n_suppliers": pc.cast(b.column("n"), pa.int64()),
            "alpha": round_like_duckdb(alpha, 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_supplier_degree_powerlaw"] = q_supplier_degree_powerlaw
ORACLE_SQL["q_supplier_degree_powerlaw"] = """
    WITH d AS (
        SELECT l_suppkey, count(DISTINCT l_partkey) AS k
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT count(*) AS n_suppliers,
           round(1.0 + count(*) / sum(ln(k * 1.0)), 6) AS alpha
    FROM d
"""


def q_click_to_purchase_latency(sf_dir: str):
    """Conversion-latency profile: minutes from each purchase back to the
    same user's latest preceding click (backward as-of join — no window
    bound, matching DuckDB ASOF), exact p50/p90 per purchase hour-of-day —
    the "how long does conversion take, and when" funnel readout.  One
    as-of exchange + one per-hour quantile exchange (24 groups)."""
    from ..stages.agg import grouped_quantiles
    from ..stages.joins import asof_join_backward

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), pa.scalar("purchase")))
        pts = pc.cast(b.column("ts"), pa.int64())
        hour = pc.subtract(
            pc.divide(pts, pa.scalar(3_600_000_000, pa.int64())),
            pc.multiply(pc.divide(pts,
                                  pa.scalar(86_400_000_000, pa.int64())),
                        pa.scalar(24, pa.int64())),
        )
        return pa.table({"user_id": b.column("user_id"), "pts": pts,
                         "hour": hour})

    def clicks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), pa.scalar("click")))
        cts = pc.cast(b.column("ts"), pa.int64())
        return pa.table({"user_id": b.column("user_id"), "cts": cts,
                         "click_ts": cts})

    j = asof_join_backward(
        ev.map_batches(purchases, batch_format="pyarrow"),
        ev.map_batches(clicks, batch_format="pyarrow"),
        left_key="user_id", right_key="user_id",
        left_ts="pts", right_ts="cts", right_value="click_ts",
        left_cols={"user_id": pa.int64(), "pts": pa.int64(),
                   "hour": pa.int64()},
    )

    def latency(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("click_ts")))
        lat = pc.divide(
            pc.cast(pc.subtract(b.column("pts"), b.column("click_ts")),
                    pa.float64()),
            pa.scalar(60_000_000.0, pa.float64()),
        )
        return pa.table({"hour": b.column("hour"), "latency_min": lat})

    lats = j.map_batches(latency, batch_format="pyarrow")
    return grouped_quantiles(lats, ["hour"], "latency_min",
                             [("p50_min", 0.5), ("p90_min", 0.9)],
                             round_to=2)


QUERIES["q_click_to_purchase_latency"] = q_click_to_purchase_latency
ORACLE_SQL["q_click_to_purchase_latency"] = """
    WITH p AS (
        SELECT user_id, ts AS pts,
               CAST(epoch_us(ts) // 3600000000
                    - (epoch_us(ts) // 86400000000) * 24 AS BIGINT) AS hour
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ),
    m AS (
        SELECT p.hour,
               (epoch_us(p.pts) - epoch_us(c.cts)) / 60000000.0
                   AS latency_min
        FROM p ASOF JOIN c
          ON p.user_id = c.user_id AND c.cts <= p.pts
    )
    SELECT hour,
           round(quantile_cont(latency_min, 0.5), 2) AS p50_min,
           round(quantile_cont(latency_min, 0.9), 2) AS p90_min
    FROM m GROUP BY hour
"""


def q_order_dow_seasonality(sf_dir: str):
    """Seasonality index by ISO weekday: each weekday's average order
    value divided by the overall average (index > 1 = above-trend day) —
    the demand-planning normalization.  Both numerator and denominator
    fold map-side in the SAME one-pass combiner (per-dow n/Σ plus their
    global roll-up), so the stream is touched once."""
    from ..stages.agg import round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def dow_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("o_orderdate"), pa.int64())
        days = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        # epoch day 0 = Thursday → ISO dow = (days + 3) % 7 + 1
        dow = pc.add(pc.subtract(
            pc.add(days, pa.scalar(3, pa.int64())),
            pc.multiply(pc.divide(pc.add(days, pa.scalar(3, pa.int64())),
                                  pa.scalar(7, pa.int64())),
                        pa.scalar(7, pa.int64())),
        ), pa.scalar(1, pa.int64()))
        return pa.table({"dow": dow, "v": b.column("o_totalprice")})

    tagged = orders.map_batches(dow_of, batch_format="pyarrow")
    per_dow = grouped_agg(tagged, ["dow"], [("n", "v", "count"),
                                            ("s", "v", "sum")])
    total_n = float(orders.count())
    total_s = float(tagged.sum("v"))
    overall = total_s / total_n

    def finalize(b: pa.Table) -> pa.Table:
        avg = pc.divide(b.column("s"), b.column("n"))
        return pa.table({
            "dow": b.column("dow"),
            "n_orders": pc.cast(b.column("n"), pa.int64()),
            "avg_value": round_like_duckdb(avg, 6),
            "seasonality_index": round_like_duckdb(
                pc.divide(avg, pa.scalar(overall, pa.float64())), 6),
        })

    return per_dow.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_order_dow_seasonality"] = q_order_dow_seasonality
ORACLE_SQL["q_order_dow_seasonality"] = """
    WITH s AS (
        SELECT CAST((epoch_us(o_orderdate) // 86400000000 + 3) % 7 + 1
                    AS BIGINT) AS dow,
               o_totalprice AS v
        FROM orders
    ),
    t AS (SELECT sum(v) / (count(*) * 1.0) AS overall FROM s)
    SELECT dow, count(*) AS n_orders,
           round(sum(v) / count(*), 6) AS avg_value,
           round(sum(v) / count(*) / (SELECT overall FROM t), 6)
               AS seasonality_index
    FROM s GROUP BY dow
"""


def q_weekly_value_growth(sf_dir: str):
    """Week-over-week growth report: total event value per week, previous
    week's total (lag), and percent change — the core business trend
    metric.  Weekly totals are one combiner exchange; the lag and the
    ratio run on the TINY weekly table via one keyed running pass
    (constant key: weeks are few by construction)."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["ts", "value"])

    def week_of(b: pa.Table) -> pa.Table:
        return pa.table({"week": _epoch_week(b.column("ts")),
                         "value": b.column("value"),
                         "__g": pa.array(np.zeros(b.num_rows, np.int8))})

    weeks = ev.map_batches(week_of, batch_format="pyarrow")
    totals = grouped_agg(weeks, ["__g", "week"], [("total", "value", "sum")])
    lagged = grouped_running(totals, key="__g", order_col="week",
                             value_col="total",
                             kinds=[("prev_total", "lag")])

    def finalize(b: pa.Table) -> pa.Table:
        cur = b.column("total")
        prev = b.column("prev_total")
        growth = pc.multiply(
            pc.subtract(pc.divide(cur, prev), pa.scalar(1.0, pa.float64())),
            pa.scalar(100.0, pa.float64()),
        )
        return pa.table({
            "week": b.column("week"),
            "total_value": round_like_duckdb(cur, 2),
            "prev_value": round_like_duckdb(prev, 2),
            "growth_pct": round_like_duckdb(growth, 6),
        })

    return lagged.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_weekly_value_growth"] = q_weekly_value_growth
ORACLE_SQL["q_weekly_value_growth"] = """
    WITH w AS (
        SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               sum(value) AS total
        FROM events GROUP BY 1
    )
    SELECT week, round(total, 2) AS total_value,
           round(lag(total) OVER (ORDER BY week), 2) AS prev_value,
           round((total / lag(total) OVER (ORDER BY week) - 1.0) * 100.0, 6)
               AS growth_pct
    FROM w
"""


def q_purchase_gains_chart(sf_dir: str):
    """Cumulative gains / lift chart (the model-eval companion to AUC and
    the calibration curve): events deciled by score (value, descending),
    per-decile positives, cumulative share of all positives captured, and
    exact lift (decile positive rate / base rate).  The decile assignment
    is one keyed running pass; everything after runs on the 10-row table."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        return pa.table({
            "event_id": b.column("event_id"),
            "neg_score": pc.multiply(b.column("value"),
                                     pa.scalar(-1.0, pa.float64())),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
            "g": pa.array(np.zeros(b.num_rows, np.int64)),
        })

    proj = ev.map_batches(project, batch_format="pyarrow")
    tiled = grouped_running(proj, key="g", order_col="neg_score",
                            value_col="y", kinds=[("decile", ("ntile", 10))],
                            tiebreak="event_id")
    d = grouped_agg(tiled, ["decile"], [("n", "y", "count"),
                                        ("pos", "y", "sum")],
                    sum_as_float=False)
    d = grouped_running(
        d.map_batches(
            lambda b: b.append_column(
                "g", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        key="g", order_col="decile", value_col="pos",
        kinds=[("cum_pos", "cumsum")],
    )
    totals = d.sum(["n", "pos"])
    n_total, p_total = float(totals["sum(n)"]), float(totals["sum(pos)"])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        pos = pc.cast(b.column("pos"), pa.float64())
        base = pa.scalar(p_total / n_total, pa.float64())
        return pa.table({
            "decile": pc.cast(b.column("decile"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
            "pos": pc.cast(b.column("pos"), pa.int64()),
            "cum_gain": round_like_duckdb(
                pc.divide(b.column("cum_pos"),
                          pa.scalar(p_total, pa.float64())), 6),
            "lift": round_like_duckdb(
                pc.divide(pc.divide(pos, n), base), 6),
        })

    return d.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_purchase_gains_chart"] = q_purchase_gains_chart
ORACLE_SQL["q_purchase_gains_chart"] = """
    WITH s AS (
        SELECT event_id, value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    t AS (
        SELECT y, ntile(10) OVER (ORDER BY value DESC, event_id) AS decile
        FROM s
    ),
    d AS (SELECT decile, count(*) AS n, sum(y) AS pos FROM t GROUP BY 1),
    tot AS (SELECT sum(n) * 1.0 AS nn, sum(pos) * 1.0 AS pp FROM d)
    SELECT decile, n, pos,
           round(sum(pos) OVER (ORDER BY decile) / (SELECT pp FROM tot), 6)
               AS cum_gain,
           round((pos * 1.0 / n)
                 / ((SELECT pp FROM tot) / (SELECT nn FROM tot)), 6) AS lift
    FROM d
"""


def q_session_bounce_rate(sf_dir: str):
    """Bounce-rate report: share of 30-min-gap sessions containing exactly
    one event, plus mean session depth — the engagement headline riding
    the same one-exchange sessionizer as q_user_sessions (bounce flags and
    both means fold map-side after it)."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import session_stats

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    sess = session_stats(ev, gap_minutes=30.0)

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "n_events": pc.cast(b.column("n_events"), pa.float64()),
            "bounce": pc.cast(pc.equal(b.column("n_events"),
                                       pa.scalar(1, pa.int64())), pa.int64()),
        })

    agg = grouped_agg(sess.map_batches(flags, batch_format="pyarrow"),
                      ["__g"], [("n_sessions", "bounce", "count"),
                                ("n_bounces", "bounce", "sum"),
                                ("depth_sum", "n_events", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_sessions"), pa.float64())
        nb = pc.cast(b.column("n_bounces"), pa.float64())
        return pa.table({
            "n_sessions": pc.cast(b.column("n_sessions"), pa.int64()),
            "n_bounces": pc.cast(b.column("n_bounces"), pa.int64()),
            "bounce_rate": round_like_duckdb(pc.divide(nb, n), 6),
            "avg_depth": round_like_duckdb(
                pc.divide(pc.cast(b.column("depth_sum"), pa.float64()), n),
                6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_session_bounce_rate"] = q_session_bounce_rate
ORACLE_SQL["q_session_bounce_rate"] = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), numbered AS (
        SELECT user_id,
               CAST(sum(new_s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM flagged
    ), sess AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM numbered GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS bounce_rate,
           round(sum(n_events) * 1.0 / count(*), 6) AS avg_depth
    FROM sess
"""


def q_purchase_first_touch_attribution(sf_dir: str):
    """First-touch attribution: each purchase's revenue credited wholly to
    the EARLIEST touch in its 7-day window — the acquisition-biased
    counterpart of last-touch, closing the attribution family
    (first / last / U-shaped / time-decay).  Reuses the shared
    purchase×touch interval join; the per-purchase argmin is one
    segmented take."""
    from ..stages.agg import grouped_map, round_like_duckdb

    pairs = _purchase_touch_pairs(sf_dir)

    empty = pa.table({"channel": pa.array([], pa.string()),
                      "value": pa.array([], pa.float64())})

    def first_part(t: pa.Table) -> pa.Table:
        from ..stages.agg import _key_run_bounds

        if t.num_rows == 0:
            return empty
        t = t.sort_by([("pid", "ascending"), ("tts", "ascending"),
                       ("tid", "ascending")])
        bounds = _key_run_bounds(t, ["pid"])
        first = t.take(pa.array(bounds[:-1]))
        return pa.table({"channel": first.column("channel"),
                         "value": first.column("value")})

    firsts = grouped_map(pairs, "pid", first_part, per_group=False,
                         empty_schema=pa.table({
                             "pid": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64()),
                             "tts": pa.array([], pa.int64()),
                             "tid": pa.array([], pa.int64()),
                             "channel": pa.array([], pa.string()),
                         }))
    out = grouped_agg(firsts, ["channel"],
                      [("n_purchases", "value", "count"),
                       ("credited_value", "value", "sum")],
                      round_to=2, sum_as_float=True)
    return out.map_batches(
        lambda b: pa.table({
            "channel": b.column("channel"),
            "n_purchases": pc.cast(b.column("n_purchases"), pa.int64()),
            "credited_value": b.column("credited_value"),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_purchase_first_touch_attribution"] = (
    q_purchase_first_touch_attribution)
ORACLE_SQL["q_purchase_first_touch_attribution"] = """
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type <> 'purchase'
    ),
    m AS (
        SELECT pid, value, channel,
               row_number() OVER (PARTITION BY pid
                                  ORDER BY tts, tid) AS rn
        FROM p JOIN t ON t.user_id = p.user_id
          AND t.tts >= p.pts - INTERVAL 7 DAY AND t.tts < p.pts
    )
    SELECT channel, count(*) AS n_purchases,
           round(sum(value), 2) AS credited_value
    FROM m WHERE rn = 1 GROUP BY channel
"""


def q_repeat_purchase_stats(sf_dir: str):
    """Repeat-purchase report: share of buyers who purchase again, and the
    exact p50/p90 days between consecutive purchases — the loyalty /
    replenishment-cycle readout.  Per-user purchase gaps come from one
    keyed running lag; buyer counts from one combiner pass; the gap
    quantiles from the exact single-group quantile exchange."""
    from ..stages.agg import grouped_quantiles, round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), pa.scalar("purchase")))
        return pa.table({
            "user_id": b.column("user_id"),
            "pts": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
        })

    p = ev.map_batches(purchases, batch_format="pyarrow")
    lagged = grouped_running(p, key="user_id", order_col="pts",
                             value_col="pts", kinds=[("prev_pts", "lag")],
                             tiebreak="event_id")

    def gaps(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("prev_pts")))
        g = pc.divide(
            pc.subtract(pc.cast(b.column("pts"), pa.float64()),
                        b.column("prev_pts")),
            pa.scalar(86_400_000_000.0, pa.float64()),
        )
        return pa.table({"__g": pa.array(np.zeros(b.num_rows, np.int8)),
                         "gap_days": g})

    q = grouped_quantiles(lagged.map_batches(gaps, batch_format="pyarrow"),
                          ["__g"], "gap_days",
                          [("p50_gap_days", 0.5), ("p90_gap_days", 0.9)],
                          round_to=4)
    per_user = grouped_agg(p, ["user_id"], [("np", "pts", "count")],
                           sum_as_float=False)

    def buyer_flags(b: pa.Table) -> pa.Table:
        np_ = pc.cast(b.column("np"), pa.int64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "one": pc.cast(pc.greater_equal(np_, pa.scalar(1, pa.int64())),
                           pa.int64()),
            "rep": pc.cast(pc.greater_equal(np_, pa.scalar(2, pa.int64())),
                           pa.int64()),
        })

    buyers = grouped_agg(
        per_user.map_batches(buyer_flags, batch_format="pyarrow"),
        ["__g"], [("n_buyers", "one", "sum"), ("n_repeat", "rep", "sum")],
        sum_as_float=False)
    # the quantile result is exactly one row — take it driver-side and
    # embed the two scalars (small-result pattern, no join needed)
    qrow = q.take(1)[0]
    p50, p90 = float(qrow["p50_gap_days"]), float(qrow["p90_gap_days"])

    def finalize(b: pa.Table) -> pa.Table:
        nb = pc.cast(b.column("n_buyers"), pa.float64())
        nr = pc.cast(b.column("n_repeat"), pa.float64())
        n = b.num_rows
        return pa.table({
            "n_buyers": pc.cast(b.column("n_buyers"), pa.int64()),
            "n_repeat_buyers": pc.cast(b.column("n_repeat"), pa.int64()),
            "repeat_rate": round_like_duckdb(pc.divide(nr, nb), 6),
            "p50_gap_days": pa.array([p50] * n, pa.float64()),
            "p90_gap_days": pa.array([p90] * n, pa.float64()),
        })

    return buyers.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_repeat_purchase_stats"] = q_repeat_purchase_stats
ORACLE_SQL["q_repeat_purchase_stats"] = """
    WITH p AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT (epoch_us(ts)
                - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)))
               / 86400000000.0 AS gap_days
        FROM p
    ),
    u AS (SELECT user_id, count(*) AS np FROM p GROUP BY 1)
    SELECT count(*) AS n_buyers,
           sum(CASE WHEN np >= 2 THEN 1 ELSE 0 END) AS n_repeat_buyers,
           round(sum(CASE WHEN np >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS repeat_rate,
           (SELECT round(quantile_cont(gap_days, 0.5), 4) FROM g
            WHERE gap_days IS NOT NULL) AS p50_gap_days,
           (SELECT round(quantile_cont(gap_days, 0.9), 4) FROM g
            WHERE gap_days IS NOT NULL) AS p90_gap_days
    FROM u
"""


def q_customer_segment_migration(sf_dir: str):
    """Customer segment migration matrix: spend quintile before vs after a
    1998-01-01 cutoff, counted per (from_q, to_q) cell — the
    period-over-period loyalty movement readout.  Per-period spend is kept
    in EXACT integer cents so equal-spend ties order identically in both
    engines (the custkey tiebreak then makes quintile membership
    deterministic); each period's quintile is one keyed running ntile over
    the small per-customer table; the matrix is one combiner exchange over
    the inner join of both periods."""
    from ..stages.window import grouped_running

    cutoff_us = 883_612_800_000_000  # 1998-01-01 epoch µs
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("o_orderdate"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "period": pc.cast(pc.greater_equal(
                us, pa.scalar(cutoff_us, pa.int64())), pa.int64()),
            "cents": cents,
        })

    proj = orders.map_batches(project, batch_format="pyarrow")
    spend = grouped_agg(proj, ["period", "o_custkey"],
                        [("s", "cents", "sum")], sum_as_float=False)
    tiled = grouped_running(
        spend.map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("s"), "s",
                pc.cast(b.column("s"), pa.int64())),
            batch_format="pyarrow"),
        key="period", order_col="s", value_col="s",
        kinds=[("quintile", ("ntile", 5))], tiebreak="o_custkey",
    )
    h1 = tiled.map_batches(
        lambda b: pa.table({
            "k1": b.column("o_custkey"), "from_q": b.column("quintile")}
        ).filter(pc.equal(b.column("period"), pa.scalar(0, pa.int64()))),
        batch_format="pyarrow",
    )
    h2 = tiled.map_batches(
        lambda b: pa.table({
            "k2": b.column("o_custkey"), "to_q": b.column("quintile")}
        ).filter(pc.equal(b.column("period"), pa.scalar(1, pa.int64()))),
        batch_format="pyarrow",
    )
    j = broadcast_join(h1, h2, left_key="k1", right_key="k2",
                       columns=["to_q"])
    out = grouped_agg(j, ["from_q", "to_q"],
                      [("n_customers", "from_q", "count")],
                      sum_as_float=False)
    return out.map_batches(
        lambda b: pa.table({
            "from_q": pc.cast(b.column("from_q"), pa.int64()),
            "to_q": pc.cast(b.column("to_q"), pa.int64()),
            "n_customers": pc.cast(b.column("n_customers"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_customer_segment_migration"] = q_customer_segment_migration
ORACLE_SQL["q_customer_segment_migration"] = """
    WITH s AS (
        SELECT o_custkey,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS period,
               sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2
    ),
    t AS (
        SELECT o_custkey, period,
               ntile(5) OVER (PARTITION BY period
                              ORDER BY cents, o_custkey) AS quintile
        FROM s
    )
    SELECT a.quintile AS from_q, b.quintile AS to_q,
           count(*) AS n_customers
    FROM t a JOIN t b ON a.o_custkey = b.o_custkey
    WHERE a.period = 0 AND b.period = 1
    GROUP BY 1, 2
"""


def q_ab_value_cuped(sf_dir: str):
    """CUPED-adjusted A/B readout: the variance-reduction workhorse of
    experimentation platforms.  Users are deterministically hash-split
    50/50; each user's PRE-period spend (first half of the global time
    range) is the covariate X, the POST-period spend the metric Y.
    θ = cov(X,Y)/var(X) is computed POOLED (both arms — standard CUPED),
    then each arm reports mean(Y) and the CUPED-adjusted
    mean(Y) − θ·(mean(X) − mean(X)_all).  Plan shape: the time bounds
    come from ONE constant-key min/max pass, the per-user bucketing from
    one more map-side pre/post conditional cent-sum pass + one per-user
    combiner exchange (the split point must exist before bucketing can
    start, so two scans is the floor); the per-user table is
    materialized ONCE and feeds
    both the pooled-moment scalar pass and the per-arm aggregate — the
    global θ and mean(X) are driver scalars broadcast into the finalize.
    All per-user sums AND the pooled second moments are exact integer
    cents / cents² (order-independent), so θ and the adjusted means are
    bit-identical to the SQL regardless of summation order (the
    .xx5-boundary hazard documented on q_supplier_region_stats)."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sample import deterministic_split

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    ev = ev.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow",
    )
    bounds = grouped_agg(
        ev.map_batches(
            lambda b: pa.table({
                "g": pa.array(np.zeros(b.num_rows, np.int8)),
                "us": pc.cast(b.column("ts"), pa.int64()),
            }),
            batch_format="pyarrow"),
        ["g"], [("lo", "us", "min"), ("hi", "us", "max")],
    ).take_all()[0]
    mid = (int(bounds["lo"]) + int(bounds["hi"])) // 2

    def prepost(b: pa.Table) -> pa.Table:
        pre = pc.less(pc.cast(b.column("ts"), pa.int64()),
                      pa.scalar(mid, pa.int64()))
        cents = pc.cast(
            pc.round(pc.multiply(b.column("value"),
                                 pa.scalar(100.0, pa.float64()))),
            pa.int64(),
        )
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "x_c": pc.if_else(pre, cents, zero),
            "y_c": pc.if_else(pre, zero, cents),
        })

    per_user = grouped_agg(
        ev.map_batches(prepost, batch_format="pyarrow"),
        ["user_id"], [("x_c", "x_c", "sum"), ("y_c", "y_c", "sum")],
        sum_as_float=False,
    ).materialize()

    tot = per_user.sum(["x_c", "y_c"])
    n_u = float(per_user.count())
    sx_c, sy_c = int(tot["sum(x_c)"]), int(tot["sum(y_c)"])
    mom = grouped_agg(
        per_user.map_batches(
            lambda b: pa.table({
                "g": pa.array(np.zeros(b.num_rows, np.int64)),
                "xy": pc.multiply(b.column("x_c"), b.column("y_c")),
                "xx": pc.multiply(b.column("x_c"), b.column("x_c")),
            }),
            batch_format="pyarrow"),
        ["g"], [("sxy", "xy", "sum"), ("sxx", "xx", "sum")],
        sum_as_float=False,
    ).take_all()[0]
    sx, sy = float(sx_c) / 100.0, float(sy_c) / 100.0
    theta = ((float(mom["sxy"]) / 10000.0 - sx * sy / n_u)
             / (float(mom["sxx"]) / 10000.0 - sx * sx / n_u))
    mx_all = sx / n_u

    sp = deterministic_split(per_user, id_col="user_id",
                             splits=[("A", 0.5), ("B", 0.5)], seed="ab1",
                             out_col="variant")
    arm = grouped_agg(sp, ["variant"], [("n_users", "x_c", "count"),
                                        ("sx_c", "x_c", "sum"),
                                        ("sy_c", "y_c", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_users"), pa.float64())
        hundred = pa.scalar(100.0, pa.float64())
        my = pc.divide(
            pc.divide(pc.cast(b.column("sy_c"), pa.float64()), hundred), n)
        mx = pc.divide(
            pc.divide(pc.cast(b.column("sx_c"), pa.float64()), hundred), n)
        adj = pc.subtract(
            my,
            pc.multiply(pa.scalar(theta, pa.float64()),
                        pc.subtract(mx, pa.scalar(mx_all, pa.float64()))),
        )
        return pa.table({
            "variant": b.column("variant"),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "mean_post": round_like_duckdb(my, 6),
            "mean_post_cuped": round_like_duckdb(adj, 6),
            "theta": round_like_duckdb(
                pa.array(np.full(b.num_rows, theta, np.float64)), 6),
        })

    return arm.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_ab_value_cuped"] = q_ab_value_cuped
ORACLE_SQL["q_ab_value_cuped"] = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100.0) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
    u AS (
        SELECT user_id,
               sum(CASE WHEN us < (SELECT mid FROM b) THEN c ELSE 0 END)
                   AS x_c,
               sum(CASE WHEN us < (SELECT mid FROM b) THEN 0 ELSE c END)
                   AS y_c
        FROM e GROUP BY user_id
    ),
    g AS (
        SELECT count(*) * 1.0 AS n,
               CAST(sum(x_c) AS DOUBLE) / 100.0 AS sx,
               CAST(sum(y_c) AS DOUBLE) / 100.0 AS sy,
               CAST(sum(x_c * y_c) AS DOUBLE) / 10000.0 AS sxy,
               CAST(sum(x_c * x_c) AS DOUBLE) / 10000.0 AS sxx
        FROM u
    ),
    th AS (
        SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
               sx / n AS mx_all
        FROM g
    )
    SELECT {_ab_split_case()} AS variant,
           count(*) AS n_users,
           round((CAST(sum(y_c) AS DOUBLE) / 100.0) / count(*), 6)
               AS mean_post,
           round((CAST(sum(y_c) AS DOUBLE) / 100.0) / count(*)
                 - (SELECT theta FROM th)
                   * ((CAST(sum(x_c) AS DOUBLE) / 100.0) / count(*)
                      - (SELECT mx_all FROM th)), 6) AS mean_post_cuped,
           round((SELECT theta FROM th), 6) AS theta
    FROM u GROUP BY 1
"""


def q_user_lifetime_hazard(sf_dir: str):
    """Nelson-Aalen cumulative hazard over user lifetimes — the
    non-parametric companion to the Kaplan-Meier curve
    (q_user_lifetime_km): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, plus the per-time
    hazard increment dᵢ/nᵢ.  Same fully distributed machinery: per-user
    lifetime is one keyed aggregate, per-time death counts one combiner
    exchange, and both running terms (at-risk nᵢ via an exclusive prefix
    sum, Σd/n via an inclusive one) ride `range_sort` +
    `global_prefix_sums` — no single-node window anywhere."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_prefix_sums

    s, total = _user_lifetime_death_table(sf_dir)

    def hazard_of(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("d_events"), pa.float64())
        n = pc.subtract(pa.scalar(total, pa.float64()), b.column("__before"))
        return pa.table({
            "days": b.column("days"),
            "n_at_risk": pc.cast(n, pa.int64()),
            "d_events": pc.cast(b.column("d_events"), pa.int64()),
            "__h": pc.divide(d, n),
        })

    s2 = s.map_batches(hazard_of, batch_format="pyarrow")
    s2 = global_prefix_sums(s2, "__h", out_name="__H", exclusive=False)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "days": b.column("days"),
            "n_at_risk": b.column("n_at_risk"),
            "d_events": b.column("d_events"),
            "hazard": round_like_duckdb(b.column("__h"), 6),
            "cum_hazard": round_like_duckdb(b.column("__H"), 6),
        })

    return s2.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_lifetime_hazard"] = q_user_lifetime_hazard
ORACLE_SQL["q_user_lifetime_hazard"] = """
    WITH l AS (
        SELECT user_id,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                    // 86400000000 AS BIGINT) AS days
        FROM events GROUP BY user_id
    ),
    t AS (SELECT count(*) * 1.0 AS total FROM l),
    d AS (SELECT days, count(*) AS d_events FROM l GROUP BY days),
    c AS (
        SELECT days, d_events,
               (SELECT total FROM t)
                   - coalesce(sum(d_events) OVER (ORDER BY days
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
        FROM d
    )
    SELECT days, CAST(n AS BIGINT) AS n_at_risk, d_events,
           round(CAST(d_events AS DOUBLE) / n, 6) AS hazard,
           round(sum(CAST(d_events AS DOUBLE) / n)
                     OVER (ORDER BY days), 6) AS cum_hazard
    FROM c
"""


def q_discount_slope_simpson(sf_dir: str):
    """Simpson's-paradox screen: the OLS slope of discount on quantity
    WITHIN each return-flag stratum vs the POOLED overall slope, with a sign-flip
    flag — the aggregated-vs-disaggregated trend-reversal detector.  One
    single pass over lineitem: `grouped_agg_sets` ROLLUP computes the
    per-mode and the grand-total moment partials in the same combiner
    exchange (the raw rows are never scanned twice); the tiny rollup
    table is materialized once, the overall row read on the driver and
    broadcast into the per-group finalize.  Signs are compared on the
    round-4 values so the flag is identical to the SQL's."""
    from ..stages.agg import grouped_agg_sets, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_discount"])
    roll = grouped_agg_sets(
        li, ["l_returnflag"],
        [("slope", ("l_quantity", "l_discount"), "slope"),
         ("n", "l_quantity", "count")],
        round_to=None,
    ).materialize()
    from ..stages.agg import round_like_duckdb as _rld
    overall_rows = [r for r in roll.take_all() if r["grouping_id"] == 1]
    slope_all = float(_rld(pa.array([overall_rows[0]["slope"]],
                                    pa.float64()), 4)[0].as_py())

    empty = pa.table({
        "l_returnflag": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "slope_group": pa.array([], pa.float64()),
        "slope_overall": pa.array([], pa.float64()),
        "disagrees": pa.array([], pa.int64()),
    })

    def finalize(b: pa.Table) -> pa.Table:
        if "grouping_id" not in b.column_names:  # schema-less empty block
            return empty
        b = b.filter(pc.equal(b.column("grouping_id"),
                              pa.scalar(0, pa.int64())))
        sg = round_like_duckdb(b.column("slope"), 4)
        # SQL CASE yields 0 (not NULL) for a NULL stratum slope
        flip = pc.coalesce(
            pc.cast(
                pc.less(pc.multiply(sg, pa.scalar(slope_all, pa.float64())),
                        pa.scalar(0.0, pa.float64())),
                pa.int64(),
            ),
            pa.scalar(0, pa.int64()),
        )
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "slope_group": sg,
            "slope_overall": pa.array(
                np.full(b.num_rows, slope_all, np.float64)),
            "disagrees": flip,
        })

    return roll.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_discount_slope_simpson"] = q_discount_slope_simpson
ORACLE_SQL["q_discount_slope_simpson"] = """
    WITH g AS (
        SELECT l_returnflag, count(*) AS n,
               round(regr_slope(l_discount, l_quantity), 4) AS slope_group
        FROM lineitem GROUP BY 1
    ),
    o AS (SELECT round(regr_slope(l_discount, l_quantity), 4)
              AS slope_overall
          FROM lineitem)
    SELECT l_returnflag, n, slope_group,
           (SELECT slope_overall FROM o) AS slope_overall,
           CAST(CASE WHEN slope_group * (SELECT slope_overall FROM o) < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS disagrees
    FROM g
"""


def q_brand_price_elasticity(sf_dir: str):
    """Per-brand price elasticity of demand: the log-log OLS slope
    regr_slope(ln qty, ln unit price) — the canonical pricing-analytics
    estimate (elasticity ≈ %Δqty / %Δprice).  Unit price is derived
    per row (extendedprice / qty), the part dimension broadcast-joined
    for the brand, and the slope comes from the same mergeable moment
    partials as corr/var — one combiner exchange, no row-level shuffle."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    joined = broadcast_join(li, part, left_key="l_partkey",
                            right_key="p_partkey", columns=["p_brand"])

    def logs(b: pa.Table) -> pa.Table:
        q = pc.cast(b.column("l_quantity"), pa.float64())
        unit = pc.divide(b.column("l_extendedprice"), q)
        return pa.table({
            "p_brand": b.column("p_brand"),
            "ln_p": pc.ln(unit),
            "ln_q": pc.ln(q),
        })

    proj = joined.map_batches(logs, batch_format="pyarrow")
    return grouped_agg(
        proj, ["p_brand"],
        [("elasticity", ("ln_p", "ln_q"), "slope"),
         ("n", "ln_q", "count")],
        round_to=4,
    )


QUERIES["q_brand_price_elasticity"] = q_brand_price_elasticity
ORACLE_SQL["q_brand_price_elasticity"] = """
    SELECT p_brand,
           round(regr_slope(ln(CAST(l_quantity AS DOUBLE)),
                            ln(l_extendedprice
                               / CAST(l_quantity AS DOUBLE))), 4)
               AS elasticity,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
"""


def q_type_forecast_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest: per event type, the daily value
    series is 'forecast' by its own value 7 observations earlier
    (lag-7 ≈ same weekday last week), and the backtest reports MAE /
    MAPE / sMAPE per type — the baseline every forecasting pipeline is
    graded against.  Daily totals are exact integer cents (one combiner
    exchange), the lag one keyed-run pass over the tiny per-day table,
    and the error metrics one more combiner pass: MAE is finalized from
    an exact integer cent sum; MAPE/sMAPE are scale-free ratios."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        cents = pc.cast(
            pc.round(pc.multiply(b.column("value"),
                                 pa.scalar(100.0, pa.float64()))),
            pa.int64(),
        )
        return pa.table({"event_type": b.column("event_type"),
                         "day": day, "c": cents})

    daily = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                        ["event_type", "day"], [("c", "c", "sum")],
                        sum_as_float=False)
    lagged = grouped_running(daily, key="event_type", order_col="day",
                             value_col="c", kinds=[("f", ("lag", 7))])

    def errs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("f")))
        a = pc.cast(b.column("c"), pa.float64())
        f = pc.cast(b.column("f"), pa.float64())
        ae_c = pc.abs(pc.subtract(b.column("c"), b.column("f")))
        ae = pc.cast(ae_c, pa.float64())
        return pa.table({
            "event_type": b.column("event_type"),
            "ae_c": ae_c,
            "ape": pc.divide(ae, a),
            "sape": pc.divide(
                pc.multiply(pa.scalar(2.0, pa.float64()), ae),
                pc.add(a, f)),
        })

    m = grouped_agg(lagged.map_batches(errs, batch_format="pyarrow"),
                    ["event_type"],
                    [("n_days", "ae_c", "count"), ("sae_c", "ae_c", "sum"),
                     ("mape", "ape", "mean"), ("smape", "sape", "mean")],
                    sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_days"), pa.float64())
        mae = pc.divide(
            pc.divide(pc.cast(b.column("sae_c"), pa.float64()),
                      pa.scalar(100.0, pa.float64())), n)
        return pa.table({
            "event_type": b.column("event_type"),
            "n_days": pc.cast(b.column("n_days"), pa.int64()),
            "mae": round_like_duckdb(mae, 6),
            "mape": round_like_duckdb(b.column("mape"), 6),
            "smape": round_like_duckdb(b.column("smape"), 6),
        })

    return m.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_type_forecast_backtest"] = q_type_forecast_backtest
ORACLE_SQL["q_type_forecast_backtest"] = """
    WITH d AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               sum(CAST(round(value * 100.0) AS BIGINT)) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    l AS (
        SELECT event_type, day, c,
               lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        FROM d
    )
    SELECT event_type, count(*) AS n_days,
           round((CAST(sum(abs(c - f)) AS DOUBLE) / 100.0) / count(*), 6)
               AS mae,
           round(avg(CAST(abs(c - f) AS DOUBLE) / CAST(c AS DOUBLE)), 6)
               AS mape,
           round(avg(2.0 * CAST(abs(c - f) AS DOUBLE)
                     / (CAST(c AS DOUBLE) + CAST(f AS DOUBLE))), 6)
               AS smape
    FROM l WHERE f IS NOT NULL GROUP BY 1
"""


def q_weekly_churn_rate(sf_dir: str):
    """Weekly churn report: of the users active in week w, the share NOT
    active in week w+1 — the inverse of next-week retention.  No week
    self-join anywhere: distinct (user, week) pairs are one combiner
    exchange, each user's sorted week run yields its consecutive-week
    pairs via one keyed lag pass, and a single map emits both the
    'active at w' and 'retained at prev' flag rows folded by one tiny
    per-week aggregate."""
    from ..stages.agg import round_like_duckdb
    from ..stages.window import grouped_running

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "week": _epoch_week(b.column("ts"))})

    pairs = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                        ["user_id", "week"], [("n", "week", "count")],
                        sum_as_float=False)
    lagged = grouped_running(pairs, key="user_id", order_col="week",
                             value_col="week", kinds=[("prev", "lag")])

    def flags(b: pa.Table) -> pa.Table:
        act = pa.table({
            "week": b.column("week"),
            "active": pa.array(np.ones(b.num_rows, np.int64)),
            "retained": pa.array(np.zeros(b.num_rows, np.int64)),
        })
        r = b.filter(pc.equal(pc.subtract(pc.cast(b.column("week"),
                                                  pa.float64()),
                                          b.column("prev")),
                              pa.scalar(1.0, pa.float64())))
        ret = pa.table({
            "week": pc.cast(r.column("prev"), pa.int64()),
            "active": pa.array(np.zeros(r.num_rows, np.int64)),
            "retained": pa.array(np.ones(r.num_rows, np.int64)),
        })
        return pa.concat_tables([act, ret])

    weekly = grouped_agg(lagged.map_batches(flags, batch_format="pyarrow"),
                         ["week"], [("n_active", "active", "sum"),
                                    ("n_retained", "retained", "sum")],
                         sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        churn = pc.subtract(
            pa.scalar(1.0, pa.float64()),
            pc.divide(
                pc.multiply(pc.cast(b.column("n_retained"), pa.float64()),
                            pa.scalar(1.0, pa.float64())),
                pc.cast(b.column("n_active"), pa.float64())),
        )
        return pa.table({
            "week": b.column("week"),
            "n_active": pc.cast(b.column("n_active"), pa.int64()),
            "n_retained": pc.cast(b.column("n_retained"), pa.int64()),
            "churn_rate": round_like_duckdb(churn, 6),
        })

    return weekly.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_weekly_churn_rate"] = q_weekly_churn_rate
ORACLE_SQL["q_weekly_churn_rate"] = """
    WITH d AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
        FROM events
    ),
    l AS (
        SELECT user_id, week,
               lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
        FROM d
    ),
    a AS (SELECT week, count(*) AS n_active FROM d GROUP BY 1),
    r AS (SELECT prev AS week, count(*) AS n_retained
          FROM l WHERE week - prev = 1 GROUP BY 1)
    SELECT a.week, a.n_active,
           coalesce(r.n_retained, 0) AS n_retained,
           round(1.0 - coalesce(r.n_retained, 0) * 1.0 / a.n_active, 6)
               AS churn_rate
    FROM a LEFT JOIN r USING (week)
"""


def q_user_journey_trigrams(sf_dir: str):
    """Sequence mining: the 20 most common 3-step event-type journeys
    (consecutive triples inside each user's time-ordered stream) — the
    path-analysis staple behind 'how do users reach purchase'.  Triples
    are read off inside the per-user run (one keyed exchange, vectorized
    index shift — the trigram extension of the Markov-transition
    kernel), counted by one tiny combiner exchange, and cut with
    `global_topk` (deterministic n-desc/path-asc total order), never a
    full sort."""
    from ..stages.agg import _key_run_bounds, grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    empty = pa.table({
        "s1": pa.array([], pa.string()),
        "s2": pa.array([], pa.string()),
        "s3": pa.array([], pa.string()),
    })

    def tri_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        n = t.num_rows
        keep = np.ones(n, bool)
        starts = bounds[:-1]
        keep[starts] = False  # no predecessor
        second = starts + 1
        keep[second[second < n]] = False  # run starts are already masked
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        return pa.table({
            "s1": pa.array(types[idx - 2], pa.string()),
            "s2": pa.array(types[idx - 1], pa.string()),
            "s3": pa.array(types[idx], pa.string()),
        })

    tris = grouped_map(
        ev, "user_id", tri_part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
        }),
    )
    counts = grouped_agg(tris, ["s1", "s2", "s3"],
                         [("n_paths", "s1", "count")], sum_as_float=False)
    counts_empty = pa.table({
        "s1": pa.array([], pa.string()),
        "s2": pa.array([], pa.string()),
        "s3": pa.array([], pa.string()),
        "n_paths": pa.array([], pa.int64()),
    })

    def cast_counts(b: pa.Table) -> pa.Table:
        if "n_paths" not in b.column_names:  # schema-less empty block
            return counts_empty
        return b.set_column(
            b.schema.get_field_index("n_paths"), "n_paths",
            pc.cast(b.column("n_paths"), pa.int64()))

    counts = counts.map_batches(cast_counts, batch_format="pyarrow")
    return global_topk(counts, ["n_paths", "s1", "s2", "s3"], 20,
                       descending=[True, False, False, False])


QUERIES["q_user_journey_trigrams"] = q_user_journey_trigrams
ORACLE_SQL["q_user_journey_trigrams"] = """
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER w AS p1,
               lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 AS s1, p1 AS s2, event_type AS s3, count(*) AS n_paths
    FROM o WHERE p2 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, s1, s2, s3
    LIMIT 20
"""


def q_embedding_clustering_coeff(sf_dir: str):
    """Local clustering coefficient per node of the embedding-similarity
    graph (cosine ≥ 0.25): 2·T / (d·(d−1)) — how clique-like each
    node's neighborhood is, the standard community-structure diagnostic
    on a near-dup graph.  The exact pair kernel runs ONCE (materialized)
    and feeds both the degree count (one combiner exchange over exploded
    endpoints) and the compact-forward triangle enumeration
    (wedge join + co-partitioned SEMI close, as q_embedding_triangles);
    a co-partitioned LEFT OUTER join stitches them (nodes in no triangle
    keep coefficient 0)."""
    from ..stages.ann import embedding_dup_pairs_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    pairs = embedding_dup_pairs_exact(emb, tau=0.25, round_to=4).materialize()

    def ends(b: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            b.column("id_a").combine_chunks().cast(pa.int64()),
            b.column("id_b").combine_chunks().cast(pa.int64()),
        ])
        return pa.table({"vec_id": node})

    deg = grouped_agg(pairs.map_batches(ends, batch_format="pyarrow"),
                      ["vec_id"], [("degree", "vec_id", "count")],
                      sum_as_float=False)

    tri = _embedding_triangle_counts(pairs)
    j = hash_join(deg, tri, left_key="vec_id", how="left outer")

    empty = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "degree": pa.array([], pa.int64()),
        "n_triangles": pa.array([], pa.int64()),
        "clustering_coeff": pa.array([], pa.float64()),
    })

    def finalize(b: pa.Table) -> pa.Table:
        if "degree" not in b.column_names:  # schema-less empty block
            return empty
        from ..stages.agg import round_like_duckdb

        t = pc.cast(pc.coalesce(b.column("n_triangles"),
                                pa.scalar(0, pa.int64())), pa.int64())
        d = pc.cast(b.column("degree"), pa.float64())
        coeff = pc.if_else(
            pc.less(b.column("degree"), pa.scalar(2, pa.int64())),
            pa.scalar(0.0, pa.float64()),
            round_like_duckdb(
                pc.divide(
                    pc.multiply(pa.scalar(2.0, pa.float64()),
                                pc.cast(t, pa.float64())),
                    pc.multiply(d, pc.subtract(
                        d, pa.scalar(1.0, pa.float64())))), 6),
        )
        return pa.table({
            "vec_id": pc.cast(b.column("vec_id"), pa.int64()),
            "degree": pc.cast(b.column("degree"), pa.int64()),
            "n_triangles": t,
            "clustering_coeff": coeff,
        })

    return j.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_embedding_clustering_coeff"] = q_embedding_clustering_coeff
ORACLE_SQL["q_embedding_clustering_coeff"] = """
    WITH e AS (
        SELECT a.vec_id AS u, b.vec_id AS v
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= 0.25
    ),
    und AS (SELECT u AS vec_id FROM e UNION ALL SELECT v FROM e),
    deg AS (SELECT vec_id, count(*) AS degree FROM und GROUP BY 1),
    t AS (
        SELECT e1.u, e1.v, e2.v AS w
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
        SELECT u AS vec_id FROM t
        UNION ALL SELECT v FROM t
        UNION ALL SELECT w FROM t
    ),
    tri AS (SELECT vec_id, count(*) AS n_triangles FROM nodes GROUP BY 1)
    SELECT d.vec_id, d.degree,
           coalesce(tri.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE round(2.0 * coalesce(tri.n_triangles, 0)
                           / (d.degree * (d.degree - 1.0)), 6)
           END AS clustering_coeff
    FROM deg d LEFT JOIN tri USING (vec_id)
"""


def q_nation_spend_theil(sf_dir: str):
    """Theil T inequality index of customer lifetime spend per nation —
    the decomposable entropy-based companion to the rank-based Gini and
    the moment-based HHI on the same shared preamble.  Unlike Gini it
    needs NO sort: T = (Σ x·ln x)/(n·μ) − ln μ comes entirely from the
    mergeable partials (n, Σx, Σ x·ln x) in one combiner exchange —
    the fully streaming inequality measure for 100 TB."""
    from ..stages.agg import round_like_duckdb

    spend = _nation_customer_spend(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        x = b.column("spend")
        return pa.table({
            "n_name": b.column("n_name"),
            "x": x,
            "xlnx": pc.multiply(x, pc.ln(x)),
        })

    agg = grouped_agg(spend.map_batches(proj, batch_format="pyarrow"),
                      ["n_name"],
                      [("n_customers", "x", "count"), ("sx", "x", "sum"),
                       ("sxlnx", "xlnx", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_customers"), pa.float64())
        mu = pc.divide(b.column("sx"), n)
        theil = pc.subtract(
            pc.divide(b.column("sxlnx"), pc.multiply(n, mu)),
            pc.ln(mu),
        )
        return pa.table({
            "n_name": b.column("n_name"),
            "n_customers": pc.cast(b.column("n_customers"), pa.int64()),
            "mean_spend": round_like_duckdb(mu, 6),
            "theil": round_like_duckdb(theil, 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_nation_spend_theil"] = q_nation_spend_theil
ORACLE_SQL["q_nation_spend_theil"] = """
    WITH spend AS (
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT n_name, spend
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, count(*) AS n_customers,
           round(sum(spend) / count(*), 6) AS mean_spend,
           round(sum(spend * ln(spend))
                     / (count(*) * (sum(spend) / count(*)))
                 - ln(sum(spend) / count(*)), 6) AS theil
    FROM j GROUP BY 1
"""


def q_burst_concurrency_curve(sf_dir: str):
    """System-load concurrency curve: how many coalesced activity bursts
    (per event-type × user, as q_concurrent_user_bursts) are open on each
    day the count CHANGES — the classic +1/−1 interval-counting sweep,
    fully distributed: burst coalescing is one keyed exchange, the delta
    fold one combiner exchange over (day, ±1) rows, and the running
    open-count a `range_sort` + `global_prefix_sums` pass — intervals are
    never expanded into per-day rows and nothing self-joins."""
    from ..stages.sort import global_prefix_sums, range_sort
    from ..stages.window import coalesce_intervals

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        s = pc.cast(b.column("ts"), pa.int64())
        dur = pc.cast(
            pc.floor(pc.multiply(b.column("value"),
                                 pa.scalar(60_000_000.0))),
            pa.int64(),
        )
        k = pc.binary_join_element_wise(
            b.column("event_type"),
            pc.cast(b.column("user_id"), pa.string()), "|",
        )
        return pa.table({"__k": k, "s": s, "e": pc.add(s, dur)})

    iv = ev.map_batches(prep, batch_format="pyarrow")
    spans = coalesce_intervals(iv, key="__k", start="s", end="e")
    day_us = pa.scalar(86_400_000_000, pa.int64())

    def deltas(b: pa.Table) -> pa.Table:
        sd = pc.divide(b.column("span_start"), day_us)
        ed = pc.add(pc.divide(b.column("span_end"), day_us),
                    pa.scalar(1, pa.int64()))
        n = b.num_rows
        return pa.table({
            "day": pa.concat_arrays([sd.combine_chunks().cast(pa.int64()),
                                     ed.combine_chunks().cast(pa.int64())]),
            "delta": pa.array(np.concatenate([np.ones(n, np.int64),
                                              -np.ones(n, np.int64)])),
        })

    d = grouped_agg(spans.map_batches(deltas, batch_format="pyarrow"),
                    ["day"], [("net_change", "delta", "sum")],
                    sum_as_float=False)
    s = range_sort(d, "day")
    s = global_prefix_sums(s, "net_change", out_name="__open",
                           exclusive=False)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": b.column("day"),
            "net_change": pc.cast(b.column("net_change"), pa.int64()),
            "n_open": pc.cast(b.column("__open"), pa.int64()),
        })

    return s.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_burst_concurrency_curve"] = q_burst_concurrency_curve
ORACLE_SQL["q_burst_concurrency_curve"] = """
    WITH iv AS (
      SELECT event_type, user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
      FROM events WHERE value IS NOT NULL
    ),
    flagged AS (
      SELECT event_type, user_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY event_type, user_id
                  ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new
      FROM iv
    ),
    isl AS (
      SELECT event_type, user_id, s, e,
             sum(new) OVER (PARTITION BY event_type, user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    spans AS (
      SELECT event_type, user_id, min(s) AS ss, max(e) AS se
      FROM isl GROUP BY event_type, user_id, grp
    ),
    deltas AS (
      SELECT ss // 86400000000 AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT se // 86400000000 + 1 AS day, -1 AS delta FROM spans
    ),
    g AS (SELECT day, sum(delta) AS net_change FROM deltas GROUP BY 1)
    SELECT day, CAST(net_change AS BIGINT) AS net_change,
           CAST(sum(net_change) OVER (ORDER BY day) AS BIGINT) AS n_open
    FROM g
"""


def _weekend_labeled_events(sf_dir: str):
    """events projected to (event_type, variant ∈ {weekday, weekend},
    value) — the temporal-split preamble shared by the weekend t-test
    and the weekend Mann-Whitney test (pure map-side derivation)."""
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def label(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        # pyarrow 16.1 has no modulo kernel: a - (a // 7) * 7
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        return pa.table({
            "event_type": b.column("event_type"),
            "variant": pc.if_else(
                pc.greater_equal(dow, pa.scalar(6, pa.int64())),
                pa.scalar("weekend"), pa.scalar("weekday")),
            "value": b.column("value"),
        })

    return ev.map_batches(label, batch_format="pyarrow")


def q_weekend_value_ttest(sf_dir: str):
    """Weekend-effect readout: per event type, a Welch two-sample t-test
    of value between weekend (ISO dow 6-7) and weekday events — the
    temporal-split twin of the hash-split A/B test, reusing the same
    mergeable-moment `ab_welch_ttest` primitive (raw stream touched
    once; the variant label is a pure map-side derivation)."""
    from ..stages.agg import ab_welch_ttest

    return ab_welch_ttest(_weekend_labeled_events(sf_dir),
                          "event_type", "variant", "value",
                          variant_a="weekday", variant_b="weekend")


QUERIES["q_weekend_value_ttest"] = q_weekend_value_ttest
ORACLE_SQL["q_weekend_value_ttest"] = """
    WITH s AS (
      SELECT event_type,
             CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 'weekend' ELSE 'weekday' END AS variant,
             value
      FROM events
    ), g AS (
      SELECT event_type, variant, count(*) AS n, avg(value) AS m,
             var_samp(value) AS v
      FROM s GROUP BY event_type, variant
    )
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
           round((a.m - b.m) / sqrt(a.v/a.n + b.v/b.n), 6) AS t_welch,
           round(pow(a.v/a.n + b.v/b.n, 2) /
                 (pow(a.v/a.n, 2)/(a.n-1) + pow(b.v/b.n, 2)/(b.n-1)), 6)
               AS df_welch
    FROM g a JOIN g b USING (event_type)
    WHERE a.variant = 'weekday' AND b.variant = 'weekend'
"""


def _session_entry_flags(sf_dir: str):
    """Per-session (entry_type, has_click, has_purchase) flags over the
    30-min-gap sessionizer — shared by the entry-conversion and
    cart-abandonment queries.  Sessions are assigned and flattened to one
    row inside the same per-user partition kernel (one keyed exchange;
    a session can never straddle batches)."""
    from ..stages.agg import _key_run_bounds, grouped_map
    from ..stages.window import _session_ids_part

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    empty = pa.table({
        "entry_type": pa.array([], pa.string()),
        "has_click": pa.array([], pa.int64()),
        "has_purchase": pa.array([], pa.int64()),
    })

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = _session_ids_part(t, 30.0, "user_id")
        bounds = _key_run_bounds(t, ["user_id", "session_id"])
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        is_click = (types == "click").astype(np.int64)
        is_purch = (types == "purchase").astype(np.int64)
        starts = bounds[:-1]
        return pa.table({
            "entry_type": pa.array(types[starts], pa.string()),
            "has_click": pa.array(
                (np.add.reduceat(is_click, starts) > 0).astype(np.int64)),
            "has_purchase": pa.array(
                (np.add.reduceat(is_purch, starts) > 0).astype(np.int64)),
        })

    return grouped_map(
        ev, "user_id", part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
        }),
    )


_SESSION_CTES = """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), numbered AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(sum(new_s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM flagged
    ), ranked AS (
        SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM numbered
    ), sess AS (
        SELECT user_id, session_id,
               max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS has_click,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase
        FROM ranked GROUP BY 1, 2
    )
"""


def q_session_entry_conversion(sf_dir: str):
    """Conversion rate by session ENTRY type: what share of sessions that
    START with a view / click / purchase contain a purchase at all — the
    landing-experience report.  One keyed sessionizer exchange flattens
    each session to (entry_type, converted) inside the partition kernel;
    a tiny combiner pass folds the report."""
    from ..stages.agg import round_like_duckdb

    sess = _session_entry_flags(sf_dir)
    agg = grouped_agg(sess, ["entry_type"],
                      [("n_sessions", "has_purchase", "count"),
                       ("n_converted", "has_purchase", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_sessions"), pa.float64())
        c = pc.cast(b.column("n_converted"), pa.float64())
        return pa.table({
            "entry_type": b.column("entry_type"),
            "n_sessions": pc.cast(b.column("n_sessions"), pa.int64()),
            "n_converted": pc.cast(b.column("n_converted"), pa.int64()),
            "conversion_rate": round_like_duckdb(
                pc.divide(pc.multiply(c, pa.scalar(1.0, pa.float64())), n),
                6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_session_entry_conversion"] = q_session_entry_conversion
ORACLE_SQL["q_session_entry_conversion"] = _SESSION_CTES + """
    SELECT entry_type, count(*) AS n_sessions,
           sum(has_purchase) AS n_converted,
           round(sum(has_purchase) * 1.0 / count(*), 6) AS conversion_rate
    FROM sess GROUP BY 1
"""


def q_session_cart_abandonment(sf_dir: str):
    """Cart-abandonment headline: of the sessions containing a click
    (add-to-cart proxy), the share with NO purchase — one number every
    commerce dashboard leads with.  Rides the same shared session-flag
    kernel as the entry-conversion report (one keyed exchange, then a
    single global combiner row)."""
    from ..stages.agg import round_like_duckdb

    sess = _session_entry_flags(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("has_click"),
                              pa.scalar(1, pa.int64())))
        aband = pc.cast(pc.equal(b.column("has_purchase"),
                                 pa.scalar(0, pa.int64())), pa.int64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "abandoned": aband,
        })

    agg = grouped_agg(sess.map_batches(proj, batch_format="pyarrow"),
                      ["__g"], [("n_click_sessions", "abandoned", "count"),
                                ("n_abandoned", "abandoned", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_click_sessions"), pa.float64())
        a = pc.cast(b.column("n_abandoned"), pa.float64())
        return pa.table({
            "n_click_sessions": pc.cast(b.column("n_click_sessions"),
                                        pa.int64()),
            "n_abandoned": pc.cast(b.column("n_abandoned"), pa.int64()),
            "abandonment_rate": round_like_duckdb(
                pc.divide(pc.multiply(a, pa.scalar(1.0, pa.float64())), n),
                6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_session_cart_abandonment"] = q_session_cart_abandonment
ORACLE_SQL["q_session_cart_abandonment"] = _SESSION_CTES + """
    SELECT count(*) AS n_click_sessions,
           sum(CASE WHEN has_purchase = 0 THEN 1 ELSE 0 END) AS n_abandoned,
           round(sum(CASE WHEN has_purchase = 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS abandonment_rate
    FROM sess WHERE has_click = 1
"""


def q_part_supplier_redundancy(sf_dir: str):
    """Supply-chain redundancy histogram: distribution of distinct-supplier
    counts per part observed in the order flow — the
    single-point-of-failure screen (the n_suppliers=1 row is the at-risk
    share).  Exact per-part COUNT(DISTINCT) via the pair-hash two-phase
    exchange, then a tiny histogram fold with the share of all parts."""
    from ..stages.agg import grouped_count_distinct, round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    per_part = grouped_count_distinct(li, ["l_partkey"], "l_suppkey",
                                      out_name="n_suppliers")
    hist = grouped_agg(per_part, ["n_suppliers"],
                       [("n_parts", "n_suppliers", "count")],
                       sum_as_float=False).materialize()
    total = float(hist.sum("n_parts"))

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_parts"), pa.float64())
        return pa.table({
            "n_suppliers": pc.cast(b.column("n_suppliers"), pa.int64()),
            "n_parts": pc.cast(b.column("n_parts"), pa.int64()),
            "share": round_like_duckdb(
                pc.divide(n, pa.scalar(total, pa.float64())), 6),
        })

    return hist.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_part_supplier_redundancy"] = q_part_supplier_redundancy
ORACLE_SQL["q_part_supplier_redundancy"] = """
    WITH p AS (
        SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY 1
    ),
    h AS (SELECT n_suppliers, count(*) AS n_parts FROM p GROUP BY 1),
    t AS (SELECT sum(n_parts) * 1.0 AS total FROM h)
    SELECT n_suppliers, n_parts,
           round(n_parts / (SELECT total FROM t), 6) AS share
    FROM h
"""


def q_priority_fulfillment_latency(sf_dir: str):
    """Fulfillment-latency SLA report: per order priority, days from
    order date to the FIRST ship date — count, mean, exact p50/p90.
    First-ship is one per-order combiner exchange, the order join one
    co-partitioned hash join, and the (priority, days) projection is
    materialized ONCE to feed both the moment aggregate and the exact
    per-group quantile exchange (5 priority groups — small and bounded,
    so the quantile co-location cannot skew; swap in t-digest partials
    if the group count ever explodes)."""
    from ..stages.agg import grouped_quantiles, round_like_duckdb

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    first = grouped_agg(li, ["l_orderkey"], [("ship", "l_shipdate", "min")])
    j = hash_join(orders, first, left_key="o_orderkey",
                  right_key="l_orderkey")

    def days_of(b: pa.Table) -> pa.Table:
        d = pc.divide(
            pc.subtract(pc.cast(b.column("ship"), pa.int64()),
                        pc.cast(b.column("o_orderdate"), pa.int64())),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "days": d})

    days = j.map_batches(days_of, batch_format="pyarrow").materialize()
    stats = grouped_agg(days, ["o_orderpriority"],
                        [("n_orders", "days", "count"),
                         ("avg_days", "days", "mean")], round_to=6)
    qs = grouped_quantiles(days, ["o_orderpriority"], "days",
                           [("p50_days", 0.5), ("p90_days", 0.9)],
                           round_to=6)
    return broadcast_join(stats, qs, left_key="o_orderpriority",
                          columns=["p50_days", "p90_days"])


QUERIES["q_priority_fulfillment_latency"] = q_priority_fulfillment_latency
ORACLE_SQL["q_priority_fulfillment_latency"] = """
    WITH f AS (
        SELECT l_orderkey, min(l_shipdate) AS ship
        FROM lineitem GROUP BY 1
    ),
    d AS (
        SELECT o_orderpriority,
               CAST((epoch_us(f.ship) - epoch_us(o_orderdate))
                    // 86400000000 AS BIGINT) AS days
        FROM orders JOIN f ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority, count(*) AS n_orders,
           round(avg(days * 1.0), 6) AS avg_days,
           round(quantile_cont(days, 0.5), 6) AS p50_days,
           round(quantile_cont(days, 0.9), 6) AS p90_days
    FROM d GROUP BY 1
"""


def q_supply_graph_assortativity(sf_dir: str):
    """Degree assortativity of the bipartite supply graph: the Pearson
    correlation between supplier degree and part degree across distinct
    (supplier, part) edges — do well-connected suppliers serve
    well-connected parts?  Distinct edges are ONE combiner exchange
    (materialized; both degree tables are cheap counts off it), the
    degree labels ride two broadcast joins (dimension-scale tables —
    swap to hash_join when they outgrow a worker), and the correlation
    itself folds map-side from mergeable moments into a single row."""
    from ..stages.agg import round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = grouped_agg(li, ["l_suppkey", "l_partkey"],
                        [("n", "l_suppkey", "count")],
                        sum_as_float=False).materialize()
    sdeg = grouped_agg(edges, ["l_suppkey"], [("sdeg", "l_suppkey", "count")],
                       sum_as_float=False)
    pdeg = grouped_agg(edges, ["l_partkey"], [("pdeg", "l_partkey", "count")],
                       sum_as_float=False)
    lab = broadcast_join(edges, sdeg, left_key="l_suppkey",
                         columns=["sdeg"])
    lab = broadcast_join(lab, pdeg, left_key="l_partkey", columns=["pdeg"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "sdeg": pc.cast(b.column("sdeg"), pa.float64()),
            "pdeg": pc.cast(b.column("pdeg"), pa.float64()),
        })

    agg = grouped_agg(lab.map_batches(proj, batch_format="pyarrow"),
                      ["__g"],
                      [("n_edges", "sdeg", "count"),
                       ("assortativity", ("sdeg", "pdeg"), "corr")])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_edges": pc.cast(b.column("n_edges"), pa.int64()),
            "assortativity": round_like_duckdb(b.column("assortativity"), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_supply_graph_assortativity"] = q_supply_graph_assortativity
ORACLE_SQL["q_supply_graph_assortativity"] = """
    WITH e AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    sd AS (SELECT l_suppkey, count(*) AS sdeg FROM e GROUP BY 1),
    pd AS (SELECT l_partkey, count(*) AS pdeg FROM e GROUP BY 1)
    SELECT count(*) AS n_edges,
           round(corr(sdeg * 1.0, pdeg * 1.0), 6) AS assortativity
    FROM e JOIN sd USING (l_suppkey) JOIN pd USING (l_partkey)
"""


def q_token_zipf_alpha(sf_dir: str):
    """Zipf/power-law exponent of the corpus token-frequency distribution
    (continuous MLE, k_min = 1): α = 1 + n/Σ ln k over per-token counts —
    the vocabulary-health diagnostic (natural text ≈ 2, templated/spammy
    corpora drift).  Tokens explode map-side (vectorized split), the
    frequency table is one combiner exchange, and the MLE folds map-side
    into a single scalar row — the same mergeable shape as the degree
    power law, applied to text."""
    from ..stages.agg import round_like_duckdb

    docs = _read(sf_dir, "documents", ["text"])

    def tokens(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        return pa.table({"token": pc.list_flatten(split)})

    freq = grouped_agg(docs.map_batches(tokens, batch_format="pyarrow"),
                       ["token"], [("k", "token", "count")],
                       sum_as_float=False)

    def lnk(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column("k"), pa.float64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "lnk": pc.ln(k),
        })

    agg = grouped_agg(freq.map_batches(lnk, batch_format="pyarrow"),
                      ["__g"], [("n", "lnk", "count"), ("s", "lnk", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        return pa.table({
            "n_distinct_tokens": pc.cast(b.column("n"), pa.int64()),
            "alpha": round_like_duckdb(
                pc.add(pa.scalar(1.0, pa.float64()),
                       pc.divide(n, b.column("s"))), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_token_zipf_alpha"] = q_token_zipf_alpha
ORACLE_SQL["q_token_zipf_alpha"] = """
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    f AS (SELECT token, count(*) AS k FROM t GROUP BY 1)
    SELECT count(*) AS n_distinct_tokens,
           round(1.0 + count(*) / sum(ln(k * 1.0)), 6) AS alpha
    FROM f
"""


def q_doc_dup_rate_by_lang(sf_dir: str):
    """Corpus duplication report per language: docs involved in an exact
    text collision, removable copies, and the dup rate — the first
    number any training-data curation pass reports.  One combiner
    exchange keyed on (lang, text) (hash the text map-side at 100 TB —
    the exchange then ships 16-byte digests, not documents), then a tiny
    per-lang flag fold."""
    from ..stages.agg import round_like_duckdb

    docs = _read(sf_dir, "documents", ["lang", "text"])
    g = grouped_agg(docs, ["lang", "text"], [("n", "text", "count")],
                    sum_as_float=False)

    def flags(b: pa.Table) -> pa.Table:
        n = b.column("n")
        dup = pc.greater(n, pa.scalar(1, pa.int64()))
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "lang": b.column("lang"),
            "n": n,
            "dup_n": pc.if_else(dup, n, zero),
            "removable": pc.if_else(
                dup, pc.subtract(n, pa.scalar(1, pa.int64())), zero),
        })

    agg = grouped_agg(g.map_batches(flags, batch_format="pyarrow"),
                      ["lang"], [("n_docs", "n", "sum"),
                                 ("n_dup_docs", "dup_n", "sum"),
                                 ("n_removable", "removable", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        nd = pc.cast(b.column("n_dup_docs"), pa.float64())
        n = pc.cast(b.column("n_docs"), pa.float64())
        return pa.table({
            "lang": b.column("lang"),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "n_dup_docs": pc.cast(b.column("n_dup_docs"), pa.int64()),
            "n_removable": pc.cast(b.column("n_removable"), pa.int64()),
            "dup_rate": round_like_duckdb(
                pc.divide(pc.multiply(nd, pa.scalar(1.0, pa.float64())), n),
                6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_doc_dup_rate_by_lang"] = q_doc_dup_rate_by_lang
ORACLE_SQL["q_doc_dup_rate_by_lang"] = """
    WITH g AS (
        SELECT lang, text, count(*) AS n FROM documents GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
           CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
               AS n_removable,
           round(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1.0 / sum(n), 6)
               AS dup_rate
    FROM g GROUP BY 1
"""


def q_weekly_type_composition_drift(sf_dir: str):
    """Composition-drift monitor: per week, the L1 distance between that
    week's event-type share mix and the overall mix — the categorical
    companion to the PSI value-drift report (alerting when the traffic
    composition shifts even if volumes look normal).  The (week, type)
    cells are ONE combiner exchange (materialized); weekly totals ride a
    broadcast join, the tiny per-type overall shares a second broadcast,
    and the per-week fold is one more small exchange."""
    from ..stages.agg import round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"week": _epoch_week(b.column("ts")),
                         "event_type": b.column("event_type")})

    cells = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                        ["week", "event_type"],
                        [("n", "week", "count")],
                        sum_as_float=False).materialize()
    wt = grouped_agg(cells, ["week"], [("wn", "n", "sum")],
                     sum_as_float=False)
    tt = grouped_agg(cells, ["event_type"], [("tn", "n", "sum")],
                     sum_as_float=False)
    total = float(cells.sum("n"))
    lab = broadcast_join(cells, wt, left_key="week", columns=["wn"])
    lab = broadcast_join(lab, tt, left_key="event_type", columns=["tn"])

    def diff(b: pa.Table) -> pa.Table:
        share_w = pc.divide(
            pc.multiply(pc.cast(b.column("n"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pc.cast(b.column("wn"), pa.float64()))
        share_all = pc.divide(pc.cast(b.column("tn"), pa.float64()),
                              pa.scalar(total, pa.float64()))
        return pa.table({
            "week": b.column("week"),
            "wn": b.column("wn"),
            "d": pc.abs(pc.subtract(share_w, share_all)),
        })

    agg = grouped_agg(lab.map_batches(diff, batch_format="pyarrow"),
                      ["week"], [("n_events", "wn", "max"),
                                 ("l1", "d", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "week": b.column("week"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "l1_shift": round_like_duckdb(b.column("l1"), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_weekly_type_composition_drift"] = q_weekly_type_composition_drift
ORACLE_SQL["q_weekly_type_composition_drift"] = """
    WITH c AS (
        SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    wt AS (SELECT week, sum(n) AS wn FROM c GROUP BY 1),
    tt AS (SELECT event_type, sum(n) AS tn FROM c GROUP BY 1),
    g AS (SELECT sum(n) * 1.0 AS total FROM c)
    SELECT c.week, CAST(max(wt.wn) AS BIGINT) AS n_events,
           round(sum(abs(c.n * 1.0 / wt.wn
                         - tt.tn / (SELECT total FROM g))), 6) AS l1_shift
    FROM c JOIN wt USING (week) JOIN tt USING (event_type)
    GROUP BY 1
"""


def q_vocab_growth_curve(sf_dir: str):
    """Vocabulary growth curve over ingest batches (doc_id // 100): new
    tokens first seen per batch and the cumulative vocabulary — the
    Heaps'-law saturation diagnostic telling a corpus builder when more
    of the same source stops adding signal.  Tokens explode map-side
    with their batch, first-seen is one min-combiner exchange over the
    token key, per-batch news one more tiny fold, and the cumulative
    curve a `range_sort` + `global_prefix_sums` pass."""
    from ..stages.sort import global_prefix_sums, range_sort

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tokens(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b.column("text"), pattern=" ")
        ids = pc.list_parent_indices(split)
        batch = pc.divide(b.column("doc_id"), pa.scalar(100, pa.int64()))
        return pa.table({"token": pc.list_flatten(split),
                         "batch": batch.take(ids)})

    first = grouped_agg(docs.map_batches(tokens, batch_format="pyarrow"),
                        ["token"], [("batch", "batch", "min")],
                        sum_as_float=False)
    news = grouped_agg(first, ["batch"], [("new_tokens", "batch", "count")],
                       sum_as_float=False)
    s = range_sort(news, "batch")
    s = global_prefix_sums(s, "new_tokens", out_name="__cum",
                           exclusive=False)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "batch": b.column("batch"),
            "new_tokens": pc.cast(b.column("new_tokens"), pa.int64()),
            "cum_vocab": pc.cast(b.column("__cum"), pa.int64()),
        })

    return s.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_vocab_growth_curve"] = q_vocab_growth_curve
ORACLE_SQL["q_vocab_growth_curve"] = """
    WITH t AS (
        SELECT doc_id // 100 AS batch,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    f AS (SELECT token, min(batch) AS batch FROM t GROUP BY 1),
    n AS (SELECT batch, count(*) AS new_tokens FROM f GROUP BY 1)
    SELECT batch, new_tokens,
           CAST(sum(new_tokens) OVER (ORDER BY batch) AS BIGINT)
               AS cum_vocab
    FROM n
"""


def q_user_burstiness(sf_dir: str):
    """Behavioral burstiness headline: Goh-Barabási B = (σ−μ)/(σ+μ) of
    each user's inter-event gaps (B→−1 periodic, 0 Poisson, →1 bursty),
    averaged over users with ≥5 gaps — the temporal-pattern diagnostic
    behind bot/fraud screens.  Gaps are read off inside the per-user run
    (one keyed exchange, vectorized diff); per-user σ/μ come from the
    mergeable moment kinds; the final average is one scalar fold."""
    from ..stages.agg import _key_run_bounds, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "gap_s": pa.array([], pa.float64())})

    def gaps_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        keep = np.ones(t.num_rows, bool)
        keep[bounds[:-1]] = False
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        return pa.table({
            "user_id": pa.array(uid[idx], pa.int64()),
            "gap_s": pa.array((us[idx] - us[idx - 1]) / 1_000_000.0,
                              pa.float64()),
        })

    gaps = grouped_map(
        ev, "user_id", gaps_part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
        }),
    )
    per_user = grouped_agg(gaps, ["user_id"],
                           [("n_gaps", "gap_s", "count"),
                            ("m", "gap_s", "mean"),
                            ("s", "gap_s", "std")])

    def b_of(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_gaps"),
                                      pa.scalar(5, pa.int64())))
        num = pc.subtract(b.column("s"), b.column("m"))
        den = pc.add(b.column("s"), b.column("m"))
        b = b.filter(pc.greater(den, pa.scalar(0.0, pa.float64())))
        num = pc.subtract(b.column("s"), b.column("m"))
        den = pc.add(b.column("s"), b.column("m"))
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "burst": pc.divide(num, den),
        })

    agg = grouped_agg(per_user.map_batches(b_of, batch_format="pyarrow"),
                      ["__g"], [("n_users", "burst", "count"),
                                ("avg_b", "burst", "mean")])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "avg_burstiness": round_like_duckdb(b.column("avg_b"), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_burstiness"] = q_user_burstiness
ORACLE_SQL["q_user_burstiness"] = """
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)))
                   / 1000000.0 AS gap_s
        FROM events
    ),
    u AS (
        SELECT user_id, count(gap_s) AS n_gaps,
               avg(gap_s) AS m, stddev_samp(gap_s) AS s
        FROM g WHERE gap_s IS NOT NULL GROUP BY 1
    )
    SELECT count(*) AS n_users,
           round(avg((s - m) / (s + m)), 6) AS avg_burstiness
    FROM u WHERE n_gaps >= 5 AND s + m > 0
"""


def _embedding_1nn_labeled(sf_dir: str):
    """Shared preamble of the 1-NN accuracy and confusion queries: the
    exact self-NN kernel (broadcast matrix, one matmul per batch,
    round-then-cut deterministic ties) with BOTH endpoints' labels
    broadcast-joined on."""
    import ray

    from ..stages.agg import grouped_topk
    from ..stages.ann import _stack, cosine_topk_multi

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    tabs = [t for t in ray.get(emb.to_arrow_refs()) if t.num_columns > 0]
    full = pa.concat_tables(tabs)
    ids = full.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)

    res = cosine_topk_multi(emb, _stack(full), k=2, query_ids=ids,
                            round_to=4)
    noself = res.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("query_id"),
                                        b.column("vec_id"))),
        batch_format="pyarrow",
    )
    best = grouped_topk(noself, "query_id", "sim", 1, descending=True,
                        tiebreak=["vec_id"])
    labels = emb.map_batches(
        lambda b: b.select(["vec_id", "label"]), batch_format="pyarrow")
    j = broadcast_join(best, labels, left_key="query_id",
                       right_key="vec_id", columns=["label"])
    nnlab = labels.map_batches(
        lambda b: pa.table({"vec_id": b.column("vec_id"),
                            "nn_label": b.column("label")}),
        batch_format="pyarrow")
    return broadcast_join(j, nnlab, left_key="vec_id", columns=["nn_label"])


def q_embedding_1nn_label_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy per class — the standard
    embedding-quality probe ("do nearest neighbors share a label?").
    Rides the shared labeled self-NN preamble; a per-label combiner
    folds the accuracy."""
    from ..stages.agg import round_like_duckdb

    j = _embedding_1nn_labeled(sf_dir)

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b.column("label"),
            "correct": pc.cast(pc.equal(b.column("label"),
                                        b.column("nn_label")), pa.int64()),
        })

    agg = grouped_agg(j.map_batches(flags, batch_format="pyarrow"),
                      ["label"], [("n", "correct", "count"),
                                  ("n_correct", "correct", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b.column("label"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "n_correct": pc.cast(b.column("n_correct"), pa.int64()),
            "accuracy": round_like_duckdb(
                pc.divide(
                    pc.multiply(pc.cast(b.column("n_correct"), pa.float64()),
                                pa.scalar(1.0, pa.float64())),
                    pc.cast(b.column("n"), pa.float64())), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_embedding_1nn_label_accuracy"] = q_embedding_1nn_label_accuracy
ORACLE_SQL["q_embedding_1nn_label_accuracy"] = """
    WITH p AS (
      SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nn_id,
             b.label AS nn_label,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4)
                 AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    nn AS (
      SELECT label, nn_label
      FROM (
        SELECT label, nn_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, nn_id) AS rn
        FROM p
      )
      WHERE rn = 1
    )
    SELECT label, count(*) AS n,
           sum(CASE WHEN label = nn_label THEN 1 ELSE 0 END) AS n_correct,
           round(sum(CASE WHEN label = nn_label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS accuracy
    FROM nn GROUP BY 1
"""


def q_embedding_label_margin(sf_dir: str):
    """Per-class embedding separability: mean intra-class cosine vs mean
    inter-class cosine and their margin — the clustering-quality score a
    retrieval corpus is graded on before training.  ONE matmul pass:
    every block scores against the broadcast matrix with the u < v mask
    (each unordered pair counted once), partials fold per LABEL PAIR
    (n, Σcos — |labels|² rows total), and the per-label margins are
    finalized on the driver from that tiny cell table."""
    import ray

    from ..stages.agg import round_like_duckdb
    from ..stages.ann import _normalize, _stack

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    tabs = [t for t in ray.get(emb.to_arrow_refs()) if t.num_columns > 0]
    full = pa.concat_tables(tabs)
    ids = full.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    labs = full.column("label").to_numpy(zero_copy_only=False)
    ref = ray.put((ids, labs, _normalize(_stack(full))))

    def cells(b: pa.Table) -> pa.Table:
        import ray as _ray

        a_ids, a_labs, a_mat = _ray.get(ref)
        q_ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        q_labs = b.column("label").to_numpy(zero_copy_only=False)
        sims = np.round(_normalize(_stack(b)) @ a_mat.T, 4)
        mask = q_ids[:, None] < a_ids[None, :]
        qi, ai = np.nonzero(mask)
        la = q_labs[qi]
        lb = a_labs[ai]
        cs = sims[qi, ai]
        t = pa.table({"la": pa.array(la.astype(np.int64), pa.int64()),
                      "lb": pa.array(lb.astype(np.int64), pa.int64()),
                      "cos": pa.array(cs, pa.float64())})
        g = t.group_by(["la", "lb"]).aggregate([("cos", "count"),
                                                ("cos", "sum")])
        return pa.table({
            "la": g.column("la"), "lb": g.column("lb"),
            "n": pc.cast(g.column("cos_count"), pa.int64()),
            "s": g.column("cos_sum"),
        })

    cell = grouped_agg(emb.map_batches(cells, batch_format="pyarrow"),
                       ["la", "lb"], [("n", "n", "sum"), ("s", "s", "sum")],
                       sum_as_float=False)
    rows = cell.take_all()
    intra: dict = {}
    inter: dict = {}
    for r in rows:
        la, lb, n, sv = r["la"], r["lb"], int(r["n"]), float(r["s"])
        if la == lb:
            c = intra.setdefault(la, [0, 0.0])
            c[0] += n
            c[1] += sv
        else:
            for lab in (la, lb):
                c = inter.setdefault(lab, [0, 0.0])
                c[0] += n
                c[1] += sv
    out = sorted(set(intra) | set(inter))
    mi = [intra[x][1] / intra[x][0] for x in out]
    me = [inter[x][1] / inter[x][0] for x in out]
    return pa.table({
        "label": pa.array(out, pa.int64()),
        "n_intra": pa.array([intra[x][0] for x in out], pa.int64()),
        "n_inter": pa.array([inter[x][0] for x in out], pa.int64()),
        "mean_intra": round_like_duckdb(pa.array(mi, pa.float64()), 6),
        "mean_inter": round_like_duckdb(pa.array(me, pa.float64()), 6),
        "margin": round_like_duckdb(
            pa.array([a - b for a, b in zip(mi, me)], pa.float64()), 6),
    })


QUERIES["q_embedding_label_margin"] = q_embedding_label_margin
ORACLE_SQL["q_embedding_label_margin"] = """
    WITH p AS (
      SELECT a.label AS la, b.label AS lb,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4)
                 AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    i AS (SELECT la AS label, count(*) AS n_intra, sum(cos) AS s_intra
          FROM p WHERE la = lb GROUP BY 1),
    e AS (SELECT label, count(*) AS n_inter, sum(cos) AS s_inter
          FROM (SELECT la AS label, cos FROM p WHERE la <> lb
                UNION ALL
                SELECT lb AS label, cos FROM p WHERE la <> lb)
          GROUP BY 1)
    SELECT label, n_intra, n_inter,
           round(s_intra / n_intra, 6) AS mean_intra,
           round(s_inter / n_inter, 6) AS mean_inter,
           round(s_intra / n_intra - s_inter / n_inter, 6) AS margin
    FROM i JOIN e USING (label)
"""


def q_segment_priority_chi2(sf_dir: str):
    """Chi-square independence between customer market segment and order
    priority — "do segments order with different urgency?", the
    cross-table twin of the type×weekday screen: one broadcast customer
    dim join + the same one-pass contingency aggregate."""
    from ..stages.agg import chi_square_independence

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_mktsegment"])
    return chi_square_independence(j, "c_mktsegment", "o_orderpriority",
                                   round_to=6)


QUERIES["q_segment_priority_chi2"] = q_segment_priority_chi2
ORACLE_SQL["q_segment_priority_chi2"] = """
    WITH j AS (
      SELECT c_mktsegment AS x, o_orderpriority AS y, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY x, y
    ),
    mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY x),
    my AS (SELECT y, sum(n) AS ny FROM j GROUP BY y),
    t AS (SELECT sum(n) AS total FROM j),
    cells AS (
      SELECT mx.nx, my.ny, coalesce(j.n, 0) AS o
      FROM mx CROSS JOIN my
      LEFT JOIN j ON j.x = mx.x AND j.y = my.y
    )
    SELECT round(sum(pow(o - nx * ny / t.total, 2)
                     / (nx * ny / t.total)), 6) AS chi2,
           CAST((SELECT count(*) - 1 FROM mx)
                * (SELECT count(*) - 1 FROM my) AS BIGINT) AS df
    FROM cells CROSS JOIN t
    GROUP BY ALL
"""


def q_embedding_1nn_confusion(sf_dir: str):
    """1-NN confusion matrix: counts and row shares of (true label →
    nearest neighbor's label) — WHERE the embedding space confuses
    classes, the companion detail to the accuracy headline.  Same shared
    labeled self-NN preamble; one tiny pair combiner + a per-row-label
    broadcast of totals."""
    from ..stages.agg import round_like_duckdb

    j = _embedding_1nn_labeled(sf_dir)
    cm = grouped_agg(j, ["label", "nn_label"],
                     [("n", "label", "count")],
                     sum_as_float=False).materialize()
    rows = grouped_agg(cm, ["label"], [("row_n", "n", "sum")],
                       sum_as_float=False)
    lab = broadcast_join(cm, rows, left_key="label", columns=["row_n"])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        rn = pc.cast(b.column("row_n"), pa.float64())
        return pa.table({
            "label": pc.cast(b.column("label"), pa.int64()),
            "nn_label": pc.cast(b.column("nn_label"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
            "row_share": round_like_duckdb(
                pc.divide(pc.multiply(n, pa.scalar(1.0, pa.float64())), rn),
                6),
        })

    return lab.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_embedding_1nn_confusion"] = q_embedding_1nn_confusion
ORACLE_SQL["q_embedding_1nn_confusion"] = """
    WITH p AS (
      SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nn_id,
             b.label AS nn_label,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4)
                 AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    nn AS (
      SELECT label, nn_label
      FROM (
        SELECT label, nn_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, nn_id) AS rn
        FROM p
      )
      WHERE rn = 1
    ),
    cm AS (SELECT label, nn_label, count(*) AS n FROM nn GROUP BY 1, 2),
    r AS (SELECT label, sum(n) AS row_n FROM cm GROUP BY 1)
    SELECT CAST(cm.label AS BIGINT) AS label,
           CAST(cm.nn_label AS BIGINT) AS nn_label, cm.n,
           round(cm.n * 1.0 / r.row_n, 6) AS row_share
    FROM cm JOIN r USING (label)
"""


def q_user_value_concentration(sf_dir: str):
    """Whale-curve headline: the minimum number of users covering 80% of
    total event value, and their share of the user base — the revenue
    concentration answer every ops review asks for.  Per-user totals are
    exact integer cents (one combiner exchange), the descending rank a
    `range_sort`, the running total one exclusive `global_prefix_sums`
    pass, and the 80% cut a map-side flag fold — no single-node window
    at any step."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        return pa.table({
            "user_id": b.column("user_id"),
            "c": pc.cast(
                pc.round(pc.multiply(b.column("value"),
                                     pa.scalar(100.0, pa.float64()))),
                pa.int64()),
        })

    per_user = grouped_agg(ev.map_batches(cents, batch_format="pyarrow"),
                           ["user_id"], [("c", "c", "sum")],
                           sum_as_float=False).materialize()
    totals = per_user.sum("c")
    n_users = per_user.count()
    thresh = 0.8 * (float(totals) * 1.0)

    s = range_sort(per_user, "c", descending=True, tiebreak=["user_id"])
    s = global_prefix_sums(s, "c", out_name="__cum_ex", exclusive=True)

    def flags(b: pa.Table) -> pa.Table:
        inside = pc.cast(pc.less(b.column("__cum_ex"),
                                 pa.scalar(thresh, pa.float64())),
                         pa.int64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "inside": inside,
        })

    agg = grouped_agg(s.map_batches(flags, batch_format="pyarrow"),
                      ["__g"], [("n_users_80", "inside", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n80 = pc.cast(b.column("n_users_80"), pa.float64())
        return pa.table({
            "n_users": pa.array(np.full(b.num_rows, n_users, np.int64)),
            "n_users_80": pc.cast(b.column("n_users_80"), pa.int64()),
            "share_80": round_like_duckdb(
                pc.divide(
                    pc.multiply(n80, pa.scalar(1.0, pa.float64())),
                    pa.scalar(float(n_users), pa.float64())), 6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_value_concentration"] = q_user_value_concentration
ORACLE_SQL["q_user_value_concentration"] = """
    WITH u AS (
        SELECT user_id, sum(CAST(round(value * 100.0) AS BIGINT)) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    t AS (SELECT sum(c) * 1.0 AS total, count(*) AS n_users FROM u),
    r AS (
        SELECT c,
               coalesce(sum(c) OVER (ORDER BY c DESC, user_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS cum_ex
        FROM u
    )
    SELECT (SELECT n_users FROM t) AS n_users,
           sum(CASE WHEN cum_ex < 0.8 * (SELECT total FROM t)
                    THEN 1 ELSE 0 END) AS n_users_80,
           round(sum(CASE WHEN cum_ex < 0.8 * (SELECT total FROM t)
                          THEN 1 ELSE 0 END) * 1.0
                 / (SELECT n_users FROM t), 6) AS share_80
    FROM r
"""


def q_nation_trade_balance(sf_dir: str):
    """Per-nation trade balance: customer order spend (demand side) vs
    supplier line revenue (supply side) and the gap — the two-fact-table
    reconciliation shape (each side is its own combiner exchange +
    broadcast dims; one tiny nation-level join stitches them)."""
    from ..stages.agg import round_like_duckdb

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = broadcast_join(cust, nation, left_key="c_nationkey",
                          right_key="n_nationkey", columns=["n_name"])
    o = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["n_name"])
    cs = grouped_agg(o, ["n_name"], [("cust_spend", "o_totalprice", "sum")])

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = broadcast_join(supp, nation, left_key="s_nationkey",
                          right_key="n_nationkey", columns=["n_name"])

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "r": pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0, pa.float64()),
                            b.column("l_discount"))),
        })

    lr = broadcast_join(li.map_batches(rev, batch_format="pyarrow"), supp,
                        left_key="l_suppkey", right_key="s_suppkey",
                        columns=["n_name"])
    sr = grouped_agg(lr, ["n_name"], [("supp_revenue", "r", "sum")])
    j = broadcast_join(cs, sr, left_key="n_name",
                       columns=["supp_revenue"])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b.column("n_name"),
            "cust_spend": round_like_duckdb(b.column("cust_spend"), 2),
            "supp_revenue": round_like_duckdb(b.column("supp_revenue"), 2),
            "balance": round_like_duckdb(
                pc.subtract(b.column("supp_revenue"),
                            b.column("cust_spend")), 2),
        })

    return j.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_nation_trade_balance"] = q_nation_trade_balance
ORACLE_SQL["q_nation_trade_balance"] = """
    WITH cs AS (
        SELECT n_name, sum(o_totalprice) AS cust_spend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    ),
    sr AS (
        SELECT n_name, sum(l_extendedprice * (1 - l_discount))
            AS supp_revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1
    )
    SELECT n_name, round(cust_spend, 2) AS cust_spend,
           round(supp_revenue, 2) AS supp_revenue,
           round(supp_revenue - cust_spend, 2) AS balance
    FROM cs JOIN sr USING (n_name)
"""


def q_doc_source_lang_mix(sf_dir: str):
    """Corpus composition audit: document counts and within-source shares
    per (source, lang) cell — the what-is-this-corpus-made-of table a
    curation run reports first.  One cell combiner exchange
    (materialized) + a broadcast of the tiny per-source totals."""
    from ..stages.agg import round_like_duckdb

    docs = _read(sf_dir, "documents", ["source", "lang"])
    cells = grouped_agg(docs, ["source", "lang"],
                        [("n", "lang", "count")],
                        sum_as_float=False).materialize()
    st = grouped_agg(cells, ["source"], [("sn", "n", "sum")],
                     sum_as_float=False)
    lab = broadcast_join(cells, st, left_key="source", columns=["sn"])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        sn = pc.cast(b.column("sn"), pa.float64())
        return pa.table({
            "source": b.column("source"),
            "lang": b.column("lang"),
            "n_docs": pc.cast(b.column("n"), pa.int64()),
            "source_share": round_like_duckdb(
                pc.divide(pc.multiply(n, pa.scalar(1.0, pa.float64())), sn),
                6),
        })

    return lab.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_doc_source_lang_mix"] = q_doc_source_lang_mix
ORACLE_SQL["q_doc_source_lang_mix"] = """
    WITH c AS (
        SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ),
    s AS (SELECT source, sum(n) AS sn FROM c GROUP BY 1)
    SELECT c.source, c.lang, c.n AS n_docs,
           round(c.n * 1.0 / s.sn, 6) AS source_share
    FROM c JOIN s USING (source)
"""


def q_top_part_per_nation(sf_dir: str):
    """Best-selling part per supplier nation (argmax-per-group): revenue
    cells fold in one (nation, part) combiner exchange, then
    `grouped_topk` takes each nation's top-1 with a deterministic
    round-then-tiebreak order (= SQL row_number) — never a global
    sort."""
    from ..stages.agg import grouped_topk, round_like_duckdb

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp = broadcast_join(supp, nation, left_key="s_nationkey",
                          right_key="n_nationkey", columns=["n_name"])
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "l_partkey": b.column("l_partkey"),
            "r": pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0, pa.float64()),
                            b.column("l_discount"))),
        })

    lab = broadcast_join(li.map_batches(rev, batch_format="pyarrow"), supp,
                         left_key="l_suppkey", right_key="s_suppkey",
                         columns=["n_name"])
    cells = grouped_agg(lab, ["n_name", "l_partkey"],
                        [("revenue", "r", "sum")], round_to=2)
    top = grouped_topk(cells, "n_name", "revenue", 1, descending=True,
                       tiebreak=["l_partkey"])
    return top.map_batches(
        lambda b: pa.table({
            "n_name": b.column("n_name"),
            "l_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
            "revenue": round_like_duckdb(b.column("revenue"), 2),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_top_part_per_nation"] = q_top_part_per_nation
ORACLE_SQL["q_top_part_per_nation"] = """
    WITH c AS (
        SELECT n_name, l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, l_partkey, revenue
    FROM (
        SELECT n_name, l_partkey, revenue,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY revenue DESC, l_partkey) AS rn
        FROM c
    )
    WHERE rn = 1
"""


def q_null_rate_trend(sf_dir: str):
    """Data-quality trend: weekly NULL rate of the value field — the
    pipeline-health monitor that catches an upstream schema break as a
    step change.  Pure map-side flags into one weekly combiner
    exchange."""
    from ..stages.agg import round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "value"])

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "week": _epoch_week(b.column("ts")),
            "is_null": pc.cast(pc.is_null(b.column("value")), pa.int64()),
        })

    agg = grouped_agg(ev.map_batches(flags, batch_format="pyarrow"),
                      ["week"], [("n_events", "is_null", "count"),
                                 ("n_null", "is_null", "sum")],
                      sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_events"), pa.float64())
        z = pc.cast(b.column("n_null"), pa.float64())
        return pa.table({
            "week": b.column("week"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "n_null": pc.cast(b.column("n_null"), pa.int64()),
            "null_rate": round_like_duckdb(
                pc.divide(pc.multiply(z, pa.scalar(1.0, pa.float64())), n),
                6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_null_rate_trend"] = q_null_rate_trend
ORACLE_SQL["q_null_rate_trend"] = """
    SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
           count(*) AS n_events,
           sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null,
           round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS null_rate
    FROM events GROUP BY 1
"""


def q_segment_spend_quantiles(sf_dir: str):
    """Customer-value distribution per market segment: exact p50/p90 of
    lifetime spend plus the segment headcount — the pricing-tier
    calibration table.  Per-customer spend is one combiner exchange, the
    segment label a broadcast dim, and the small labeled table is
    materialized ONCE to feed both the count aggregate and the exact
    per-segment quantile exchange (5 segments, bounded)."""
    from ..stages.agg import grouped_quantiles

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = grouped_agg(orders, ["o_custkey"],
                        [("spend", "o_totalprice", "sum")])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    lab = broadcast_join(spend, cust, left_key="o_custkey",
                         right_key="c_custkey",
                         columns=["c_mktsegment"]).materialize()
    n = grouped_agg(lab, ["c_mktsegment"],
                    [("n_customers", "spend", "count")], sum_as_float=False)
    qs = grouped_quantiles(lab, ["c_mktsegment"], "spend",
                           [("p50_spend", 0.5), ("p90_spend", 0.9)],
                           round_to=6)
    out = broadcast_join(n, qs, left_key="c_mktsegment",
                         columns=["p50_spend", "p90_spend"])
    return out.map_batches(
        lambda b: pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "n_customers": pc.cast(b.column("n_customers"), pa.int64()),
            "p50_spend": b.column("p50_spend"),
            "p90_spend": b.column("p90_spend"),
        }),
        batch_format="pyarrow",
    )


QUERIES["q_segment_spend_quantiles"] = q_segment_spend_quantiles
ORACLE_SQL["q_segment_spend_quantiles"] = """
    WITH s AS (
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY 1
    )
    SELECT c_mktsegment, count(*) AS n_customers,
           round(quantile_cont(spend, 0.5), 6) AS p50_spend,
           round(quantile_cont(spend, 0.9), 6) AS p90_spend
    FROM s JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
"""


def q_event_type_anova(sf_dir: str):
    """One-way ANOVA F-test of event value across event types — the
    k-sample fixed-effects screen (does mean value differ by type at
    all?) complementing the pairwise t-tests: one mergeable-moment
    grouped_agg collapses the stream to k rows, a tiny finalize computes
    F and the effect size η²."""
    from ..stages.agg import oneway_anova

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return oneway_anova(ev, "event_type", "value")


QUERIES["q_event_type_anova"] = q_event_type_anova
ORACLE_SQL["q_event_type_anova"] = """
    WITH g AS (
      SELECT event_type, count(*) AS n, avg(value) AS m,
             var_samp(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(n) AS nt, sum(n * m) / sum(n) AS gm
      FROM g
    ),
    ss AS (
      SELECT (SELECT sum(n * ((m - gm) * (m - gm))) FROM g, tot) AS ssb,
             (SELECT sum((n - 1.0) * v) FROM g WHERE n > 1) AS ssw
    )
    SELECT (SELECT k FROM tot) AS k_groups,
           CAST((SELECT nt FROM tot) AS BIGINT) AS n_total,
           round(CASE WHEN ssw > 0 THEN (ssb / ((SELECT k FROM tot) - 1.0))
                 / (ssw / ((SELECT nt FROM tot) - (SELECT k FROM tot)))
                 END, 6) AS f_stat,
           round(CASE WHEN ssb + ssw > 0 THEN ssb / (ssb + ssw) END, 6)
               AS eta_sq
    FROM ss
"""


def q_weekend_value_mannwhitney(sf_dir: str):
    """Weekend-effect readout, non-parametric: per event type a
    Mann-Whitney U (Wilcoxon rank-sum) test of value between weekend and
    weekday events — tie-averaged ranks from the distinct-value combiner
    (never ranks raw rows), tie-corrected normal z.  The rank-based twin
    of q_weekend_value_ttest over the same shared temporal-split
    preamble."""
    from ..stages.agg import mann_whitney_u

    return mann_whitney_u(_weekend_labeled_events(sf_dir),
                          "event_type", "variant", "value",
                          variant_a="weekday", variant_b="weekend")


QUERIES["q_weekend_value_mannwhitney"] = q_weekend_value_mannwhitney
ORACLE_SQL["q_weekend_value_mannwhitney"] = """
    WITH s AS (
      SELECT event_type,
             CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 'weekend' ELSE 'weekday' END AS variant,
             value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, variant,
             rank() OVER (PARTITION BY event_type ORDER BY value)
               + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0
               AS frank
      FROM s
    ),
    g AS (
      SELECT event_type,
             sum(CASE WHEN variant = 'weekday' THEN frank END) AS r1,
             CAST(sum(CASE WHEN variant = 'weekday' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN variant = 'weekend' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS n2
      FROM r GROUP BY 1
    ),
    ties AS (
      SELECT event_type, sum(CAST(t * t * t - t AS DOUBLE)) AS tie
      FROM (SELECT event_type, value, count(*) AS t FROM s GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT g.event_type,
           CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(r1 - n1 * (n1 + 1.0) / 2.0, 6) AS u_stat,
           CASE WHEN n1 * n2 / 12.0
                     * (((n1 + n2) + 1.0)
                        - tie / ((n1 + n2) * ((n1 + n2) - 1.0))) > 0
                THEN round(((r1 - n1 * (n1 + 1.0) / 2.0) - n1 * n2 / 2.0)
                           / sqrt(n1 * n2 / 12.0
                                  * (((n1 + n2) + 1.0)
                                     - tie / ((n1 + n2)
                                              * ((n1 + n2) - 1.0)))), 6)
           END AS z_stat
    FROM g JOIN ties USING (event_type)
    WHERE n1 > 0 AND n2 > 0
"""


def q_conversion_ztest(sf_dir: str):
    """A/B conversion readout: users deterministically hash-split 50/50
    (same split as q_ab_value_ttest), conversion = user ever fired a
    purchase event; two-proportion pooled z-test between the arms.  Per-
    user flags are one keyed MAX aggregate; the test statistic comes from
    a 2-row table."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sample import deterministic_split

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "is_purch": pc.cast(
                pc.equal(b.column("event_type"), pa.scalar("purchase")),
                pa.int64()),
        })

    per_user = grouped_agg(ev.map_batches(flag, batch_format="pyarrow"),
                           ["user_id"], [("conv", "is_purch", "max")])
    sp = deterministic_split(per_user, id_col="user_id",
                             splits=[("A", 0.5), ("B", 0.5)], seed="ab1",
                             out_col="variant")
    g = grouped_agg(sp, ["variant"],
                    [("n", "conv", "count"), ("c", "conv", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "conv_a": pa.array([], pa.int64()),
            "conv_b": pa.array([], pa.int64()),
            "rate_a": pa.array([], pa.float64()),
            "rate_b": pa.array([], pa.float64()),
            "z_prop": pa.array([], pa.float64()),
        })
        rows = {r["variant"]: r for r in t.to_pylist()}
        if "A" not in rows or "B" not in rows:
            return empty
        a, b = rows["A"], rows["B"]
        n1, n2 = float(a["n"]), float(b["n"])
        c1, c2 = float(a["c"]), float(b["c"])
        p1, p2 = c1 / n1, c2 / n2
        pp = (c1 + c2) / (n1 + n2)
        se2 = pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)
        z = (p1 - p2) / np.sqrt(se2) if se2 > 0.0 else None
        out = pa.table({
            "n_a": pa.array([int(n1)], pa.int64()),
            "n_b": pa.array([int(n2)], pa.int64()),
            "conv_a": pa.array([int(c1)], pa.int64()),
            "conv_b": pa.array([int(c2)], pa.int64()),
            "rate_a": pa.array([p1], pa.float64()),
            "rate_b": pa.array([p2], pa.float64()),
            "z_prop": pa.array([z], pa.float64()),
        })
        for name in ("rate_a", "rate_b", "z_prop"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_a", "n_b", "conv_a", "conv_b",
                            "rate_a", "rate_b", "z_prop"]),
        batch_format="pyarrow")


QUERIES["q_conversion_ztest"] = q_conversion_ztest
ORACLE_SQL["q_conversion_ztest"] = f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT {_ab_split_case()} AS variant, count(*) AS n, sum(conv) AS c
      FROM u GROUP BY 1
    )
    SELECT a.n AS n_a, b.n AS n_b,
           CAST(a.c AS BIGINT) AS conv_a, CAST(b.c AS BIGINT) AS conv_b,
           round(a.c * 1.0 / a.n, 6) AS rate_a,
           round(b.c * 1.0 / b.n, 6) AS rate_b,
           round((a.c * 1.0 / a.n - b.c * 1.0 / b.n)
                 / sqrt(((a.c + b.c) * 1.0 / (a.n + b.n))
                        * (1.0 - (a.c + b.c) * 1.0 / (a.n + b.n))
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS z_prop
    FROM g a, g b WHERE a.variant = 'A' AND b.variant = 'B'
"""


def _daily_order_revenue_cents(sf_dir: str):
    """Exact-integer-cents daily order revenue (one combiner exchange) —
    the tiny series shared by the Mann-Kendall/Theil-Sen trend test and
    the Holt smoother.  Columns (day BIGINT, c BIGINT-cents)."""
    from ..stages.agg import grouped_agg

    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def day_cents(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        c = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"day": day, "cents": c})

    return grouped_agg(ords.map_batches(day_cents, batch_format="pyarrow"),
                       ["day"], [("c", "cents", "sum")])


def q_daily_revenue_trend(sf_dir: str):
    """Monotone-trend test on the daily revenue series: Mann-Kendall S
    with tie-corrected normal z, plus the Theil-Sen (median-of-pairwise-
    slopes) robust trend estimate.  The raw order stream collapses to one
    exact-integer-cents row per day via the combiner exchange; the O(n²)
    pairwise pass runs vectorized over that tiny series (n ≈ 2.4k days →
    2.9M sign/slope pairs in one numpy shot — at larger n, roll up to
    weeks first).  Sen slope interpolates like DuckDB ``quantile_cont``."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "s_stat": pa.array([], pa.int64()),
            "z_mk": pa.array([], pa.float64()),
            "sen_slope": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        d = t.column("day").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        n = len(d)
        iu, ju = np.triu_indices(n, 1)
        dy = c[ju] - c[iu]
        s = int(np.sign(dy).sum())
        _, cnt = np.unique(c, return_counts=True)
        cnt = cnt.astype(np.float64)
        tt = float((cnt * (cnt - 1.0) * (2.0 * cnt + 5.0)).sum())
        nf = float(n)
        var_s = (nf * (nf - 1.0) * (2.0 * nf + 5.0) - tt) / 18.0
        if s > 0:
            z = (s - 1.0) / np.sqrt(var_s)
        elif s < 0:
            z = (s + 1.0) / np.sqrt(var_s)
        else:
            z = 0.0
        slopes = np.sort((dy.astype(np.float64) / 100.0)
                         / (d[ju] - d[iu]).astype(np.float64))
        h = (len(slopes) - 1) * 0.5
        lo = int(np.floor(h))
        # DuckDB quantile_cont interpolation: x[lo] + (x[lo+1]-x[lo])*frac
        sen = (slopes[lo] if h == lo
               else slopes[lo] + (slopes[lo + 1] - slopes[lo]) * (h - lo))
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "z_mk": pa.array([float(z)], pa.float64()),
            "sen_slope": pa.array([float(sen)], pa.float64()),
        })
        for name in ("z_mk", "sen_slope"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "s_stat", "z_mk", "sen_slope"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_trend"] = q_daily_revenue_trend
ORACLE_SQL["q_daily_revenue_trend"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT (b.c - a.c) AS dy,
             (CAST(b.c - a.c AS DOUBLE) / 100.0)
               / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM d a JOIN d b ON b.day > a.day
    ),
    tie AS (
      SELECT coalesce(sum(CAST(t AS DOUBLE) * (t - 1.0) * (2.0 * t + 5.0)),
                      0.0) AS tt
      FROM (SELECT c, count(*) AS t FROM d GROUP BY 1) WHERE t > 1
    ),
    st AS (
      SELECT CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1
                           ELSE 0 END) AS BIGINT) AS s,
             quantile_cont(slope, 0.5) AS sen
      FROM p
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS nf, count(*) AS n FROM d)
    SELECT n AS n_days, s AS s_stat,
           round(CASE
             WHEN s > 0 THEN (s - 1.0)
               / sqrt((nf * (nf - 1.0) * (2.0 * nf + 5.0) - tt) / 18.0)
             WHEN s < 0 THEN (s + 1.0)
               / sqrt((nf * (nf - 1.0) * (2.0 * nf + 5.0) - tt) / 18.0)
             ELSE 0.0 END, 6) AS z_mk,
           round(sen, 6) AS sen_slope
    FROM st, nn, tie
"""


def q_monthly_price_index(sf_dir: str):
    """Monthly Laspeyres / Paasche / Fisher price indices vs the first
    shipping month (matched-sample basket): per-(month, part) unit prices
    from one combiner exchange (qty sum + exact-cents revenue sum), the
    base month's ≤|parts| basket broadcast onto every month's rows, and
    the four Σp·q index sums folded in a second combiner pass — the raw
    lineitem stream is touched once and nothing self-joins."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_partkey", "l_quantity", "l_extendedprice"])

    def proj(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b.column("l_shipdate"), unit="month")
        e = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"month": month, "l_partkey": b.column("l_partkey"),
                         "q": b.column("l_quantity"), "e": e})

    # |months x parts| rows; materialized once — read by the base-month
    # scan, the month list, and the join probe (no combiner re-execution)
    pm = grouped_agg(li.map_batches(proj, batch_format="pyarrow"),
                     ["month", "l_partkey"],
                     [("q", "q", "sum"), ("e", "e", "sum")]).materialize()

    months = grouped_agg(pm, ["month"], [("__n", "month", "count")])
    m0 = min(r["month"] for r in months.take_all())

    def base_of(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("month"), pa.scalar(m0)))
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "q0": b.column("q"), "e0": b.column("e")})

    base = pm.map_batches(base_of, batch_format="pyarrow")
    j = broadcast_join(pm, base, left_key="l_partkey",
                       right_key="l_partkey", columns=["q0", "e0"])

    def products(b: pa.Table) -> pa.Table:
        pt = pc.divide(pc.divide(pc.cast(b.column("e"), pa.float64()),
                                 pa.scalar(100.0, pa.float64())),
                       b.column("q"))
        p0 = pc.divide(pc.divide(pc.cast(b.column("e0"), pa.float64()),
                                 pa.scalar(100.0, pa.float64())),
                       b.column("q0"))
        return pa.table({
            "month": b.column("month"),
            "ptq0": pc.multiply(pt, b.column("q0")),
            "p0q0": pc.multiply(p0, b.column("q0")),
            "ptqt": pc.multiply(pt, b.column("q")),
            "p0qt": pc.multiply(p0, b.column("q")),
        })

    g = grouped_agg(j.map_batches(products, batch_format="pyarrow"),
                    ["month"],
                    [("n_parts", "ptq0", "count"), ("ptq0", "ptq0", "sum"),
                     ("p0q0", "p0q0", "sum"), ("ptqt", "ptqt", "sum"),
                     ("p0qt", "p0qt", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        lasp = pc.divide(b.column("ptq0"), b.column("p0q0"))
        paas = pc.divide(b.column("ptqt"), b.column("p0qt"))
        fisher = pc.sqrt(pc.multiply(lasp, paas))
        return pa.table({
            "month": b.column("month"),
            "n_parts": pc.cast(b.column("n_parts"), pa.int64()),
            "laspeyres": round_like_duckdb(lasp, 6),
            "paasche": round_like_duckdb(paas, 6),
            "fisher": round_like_duckdb(fisher, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_monthly_price_index"] = q_monthly_price_index
ORACLE_SQL["q_monthly_price_index"] = """
    WITH pm AS (
      SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
             sum(l_quantity) AS q,
             sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS e
      FROM lineitem GROUP BY 1, 2
    ),
    b AS (SELECT min(month) AS m0 FROM pm),
    base AS (
      SELECT l_partkey, q AS q0, e AS e0 FROM pm, b WHERE month = m0
    ),
    j AS (
      SELECT month, pm.l_partkey,
             (CAST(pm.e AS DOUBLE) / 100.0) / pm.q AS pt,
             (CAST(e0 AS DOUBLE) / 100.0) / q0 AS p0,
             pm.q AS qt, q0
      FROM pm JOIN base USING (l_partkey)
    )
    SELECT month, count(*) AS n_parts,
           round(sum(pt * q0) / sum(p0 * q0), 6) AS laspeyres,
           round(sum(pt * qt) / sum(p0 * qt), 6) AS paasche,
           round(sqrt((sum(pt * q0) / sum(p0 * q0))
                      * (sum(pt * qt) / sum(p0 * qt))), 6) AS fisher
    FROM j GROUP BY 1
"""


def q_wau_jaccard_trend(sf_dir: str):
    """Audience-overlap trend: Jaccard similarity of consecutive weeks'
    active-user sets — |W_t ∩ W_{t+1}| via a per-user consecutive-week
    kernel over the distinct (week, user) combiner output (the user sets
    themselves are never shipped or self-joined), stitched onto the tiny
    per-week count table by week-shifted hash joins."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def week_of(b: pa.Table) -> pa.Table:
        return pa.table({"week": _epoch_week(b.column("ts")),
                         "user_id": b.column("user_id")})

    wu = grouped_agg(ev.map_batches(week_of, batch_format="pyarrow"),
                     ["week", "user_id"], [("__n", "week", "count")])
    # |distinct (week,user)| rows; materialized once — read by both the
    # consecutive-week kernel and the weekly counts
    wu = wu.map_batches(lambda b: b.select(["week", "user_id"]),
                        batch_format="pyarrow").materialize()

    empty_pairs = pa.table({"week": pa.array([], pa.int64())})

    def consec(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty_pairs
        t = t.sort_by([("user_id", "ascending"), ("week", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("week").to_numpy(zero_copy_only=False)
        both = (uid[1:] == uid[:-1]) & (w[1:] == w[:-1] + 1)
        return pa.table({"week": pa.array(w[:-1][both], pa.int64())})

    pairs = grouped_map(wu, "user_id", consec, per_group=False,
                        empty_schema=pa.table({
                            "week": pa.array([], pa.int64()),
                            "user_id": pa.array([], pa.int64())}))
    inter = grouped_agg(pairs, ["week"], [("n_both", "week", "count")])
    wc = grouped_agg(wu, ["week"], [("n_users", "user_id", "count")])

    nxt = wc.map_batches(
        lambda b: pa.table({
            "week": pc.subtract(b.column("week"), pa.scalar(1, pa.int64())),
            "n_users_next": b.column("n_users"),
        }), batch_format="pyarrow")
    j = hash_join(wc, nxt, left_key="week", right_key="week", how="inner")
    j = hash_join(j, inter, left_key="week", right_key="week",
                  how="left outer")

    def finalize(b: pa.Table) -> pa.Table:
        nb = pc.coalesce(b.column("n_both"), pa.scalar(0, pa.int64()))
        n = pc.cast(b.column("n_users"), pa.float64())
        nn = pc.cast(b.column("n_users_next"), pa.float64())
        nbf = pc.cast(nb, pa.float64())
        jac = pc.divide(nbf, pc.subtract(pc.add(n, nn), nbf))
        return pa.table({
            "week": b.column("week"),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "n_users_next": pc.cast(b.column("n_users_next"), pa.int64()),
            "n_both": pc.cast(nb, pa.int64()),
            "jaccard": round_like_duckdb(jac, 6),
        })

    return j.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_wau_jaccard_trend"] = q_wau_jaccard_trend
ORACLE_SQL["q_wau_jaccard_trend"] = """
    WITH wu AS (
      SELECT DISTINCT epoch_us(ts) // 604800000000 AS week, user_id
      FROM events
    ),
    wc AS (SELECT week, count(*) AS n FROM wu GROUP BY 1),
    i AS (
      SELECT a.week AS week, count(*) AS nb
      FROM wu a JOIN wu b
        ON a.user_id = b.user_id AND b.week = a.week + 1
      GROUP BY 1
    )
    SELECT wc.week AS week, wc.n AS n_users, w2.n AS n_users_next,
           coalesce(nb, 0) AS n_both,
           round(coalesce(nb, 0) * 1.0
                 / (wc.n + w2.n - coalesce(nb, 0)), 6) AS jaccard
    FROM wc JOIN wc w2 ON w2.week = wc.week + 1
    LEFT JOIN i ON i.week = wc.week
"""


def q_event_gap_report(sf_dir: str):
    """Stream-continuity audit (outage detection): the 10 longest quiet
    gaps between consecutive distinct event timestamps.  Fully
    distributed ``lead()``: the distinct-timestamp combiner, a range sort,
    global row numbers (O(blocks) driver cumsum, blocks never move), then
    a co-partitioned self hash-join on rn = rn+1 pairs each timestamp
    with its successor — no single-node window, no driver collect."""
    from ..stages.agg import global_topk, grouped_agg
    from ..stages.sort import global_row_numbers, range_sort

    ev = _read(sf_dir, "events", ["ts"])

    def us_of(b: pa.Table) -> pa.Table:
        return pa.table({"us": pc.cast(b.column("ts"), pa.int64())})

    ts = grouped_agg(ev.map_batches(us_of, batch_format="pyarrow"),
                     ["us"], [("__n", "us", "count")])
    ts = ts.map_batches(lambda b: b.select(["us"]), batch_format="pyarrow")
    s = range_sort(ts, "us")
    rn = global_row_numbers(s, out_name="rn")

    nxt = rn.map_batches(
        lambda b: pa.table({
            "rn": pc.subtract(b.column("rn"), pa.scalar(1, pa.int64())),
            "next_us": b.column("us"),
        }), batch_format="pyarrow")
    j = hash_join(rn, nxt, left_key="rn", right_key="rn", how="inner")

    empty_gaps = pa.table({"gap_start_us": pa.array([], pa.int64()),
                           "gap_end_us": pa.array([], pa.int64()),
                           "gap_us": pa.array([], pa.int64())})

    def gaps(b: pa.Table) -> pa.Table:
        if "next_us" not in b.column_names:    # schema-less empty block
            return empty_gaps
        return pa.table({
            "gap_start_us": b.column("us"),
            "gap_end_us": b.column("next_us"),
            "gap_us": pc.subtract(b.column("next_us"), b.column("us")),
        })

    g = j.map_batches(gaps, batch_format="pyarrow")
    return global_topk(g, ["gap_us", "gap_start_us"], 10,
                       descending=[True, False], empty_schema=empty_gaps)


QUERIES["q_event_gap_report"] = q_event_gap_report
ORACLE_SQL["q_event_gap_report"] = """
    WITH s AS (SELECT DISTINCT epoch_us(ts) AS us FROM events),
    l AS (SELECT us, lead(us) OVER (ORDER BY us) AS nus FROM s)
    SELECT us AS gap_start_us, nus AS gap_end_us, nus - us AS gap_us
    FROM l WHERE nus IS NOT NULL
    ORDER BY gap_us DESC, gap_start_us LIMIT 10
"""


def q_duplicate_payment_screen(sf_dir: str):
    """Duplicate-charge screen (fraud/data-quality): purchases by the
    same user for the same whole-currency amount within 24 hours of the
    previous one.  Integer dollars key the (user, amount) runs; each run
    is time-sorted inside one co-partition kernel (consecutive-pair lag —
    the purchase stream never self-joins).  Returns per-user flagged
    counts and flagged exact-cents dollar totals, largest first
    (top 20)."""
    from ..stages.agg import global_topk, grouped_agg, grouped_map

    ev = _read(sf_dir, "events",
               ["user_id", "event_type", "value", "ts", "event_id"])

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.equal(b.column("event_type"), pa.scalar("purchase")),
            pc.is_valid(b.column("value"))))
        return pa.table({
            "user_id": b.column("user_id"),
            "dollars": pc.cast(pc.round(b.column("value")), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("value"), pa.scalar(100.0, pa.float64()))),
                pa.int64()),
            "us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
        })

    p = ev.map_batches(purchases, batch_format="pyarrow")
    empty_out = pa.table({"user_id": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty_out
        t = t.sort_by([("user_id", "ascending"), ("dollars", "ascending"),
                       ("us", "ascending"), ("event_id", "ascending")])
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("dollars").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        dup = ((uid[1:] == uid[:-1]) & (d[1:] == d[:-1])
               & (us[1:] - us[:-1] <= 86_400_000_000))
        return pa.table({"user_id": pa.array(uid[1:][dup], pa.int64()),
                         "cents": pa.array(c[1:][dup], pa.int64())})

    flagged = grouped_map(
        p, "user_id", flag, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "dollars": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "us": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64())}))
    per_user = grouped_agg(flagged, ["user_id"],
                           [("n_dupes", "user_id", "count"),
                            ("dup_cents", "cents", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        if "n_dupes" not in b.column_names:    # schema-less empty block
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_dupes": pa.array([], pa.int64()),
                "dup_value_total": pa.array([], pa.float64()),
            })
        return pa.table({
            "user_id": b.column("user_id"),
            "n_dupes": pc.cast(b.column("n_dupes"), pa.int64()),
            "dup_value_total": pc.divide(
                pc.cast(b.column("dup_cents"), pa.float64()),
                pa.scalar(100.0, pa.float64())),
        })

    return global_topk(
        per_user.map_batches(finish, batch_format="pyarrow"),
        ["n_dupes", "user_id"], 20, descending=[True, False],
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_dupes": pa.array([], pa.int64()),
            "dup_value_total": pa.array([], pa.float64()),
        }))


QUERIES["q_duplicate_payment_screen"] = q_duplicate_payment_screen
ORACLE_SQL["q_duplicate_payment_screen"] = """
    WITH p AS (
      SELECT user_id, CAST(round(value) AS BIGINT) AS dollars,
             CAST(round(value * 100.0) AS BIGINT) AS cents,
             epoch_us(ts) AS us, event_id
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    l AS (
      SELECT user_id, cents, us,
             lag(us) OVER (PARTITION BY user_id, dollars
                           ORDER BY us, event_id) AS prev_us
      FROM p
    ),
    f AS (SELECT user_id, cents FROM l WHERE us - prev_us <= 86400000000)
    SELECT user_id, count(*) AS n_dupes,
           CAST(sum(cents) AS DOUBLE) / 100.0 AS dup_value_total
    FROM f GROUP BY 1
    ORDER BY n_dupes DESC, user_id LIMIT 20
"""


def q_dow_value_kruskal(sf_dir: str):
    """Kruskal-Wallis H across the 7 days-of-week on event value — the
    k-sample rank test (the non-parametric twin of q_event_type_anova).
    Global tie-averaged ranks come from the distinct-value combiner +
    range sort + prefix sums (raw rows never ranked); per-day rank sums
    are exact half-integer folds; H and its tie-corrected variant
    finalize from a 7-row table."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.joins import hash_join
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        return pa.table({"dow": dow, "value": b.column("value")})

    base = ev.map_batches(proj, batch_format="pyarrow")
    # |dow x distinct values| rows; materialized once — read by both the
    # per-value rollup and the rank join (no combiner re-execution)
    g = grouped_agg(base, ["dow", "value"],
                    [("n", "value", "count")]).materialize()

    # fractional ranks from the per-value totals (one range sort of
    # |distinct| rows + an exclusive prefix sum)
    v = grouped_agg(g, ["value"], [("t", "n", "sum")])
    s = range_sort(v, "value")
    s = global_prefix_sums(s, "t", out_name="__below", exclusive=True)

    def frank_of(b: pa.Table) -> pa.Table:
        below = b.column("__below").to_numpy(zero_copy_only=False)
        t = b.column("t").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "value": b.column("value"),
            "frank": pa.array(below + (t + 1.0) / 2.0, pa.float64()),
            "tie3": pa.array(t ** 3 - t, pa.float64()),
        })

    # |distinct values| rows; materialized once — read by both the tie
    # total and the rank join (no lineage re-execution of the sort)
    franks = s.map_batches(frank_of, batch_format="pyarrow").materialize()
    j = hash_join(g, franks, left_key="value", right_key="value",
                  how="inner")

    def weighted(b: pa.Table) -> pa.Table:
        return pa.table({
            "dow": b.column("dow"),
            "nf": pc.multiply(pc.cast(b.column("n"), pa.float64()),
                              b.column("frank")),
            "n": b.column("n"),
        })

    per_dow = grouped_agg(j.map_batches(weighted, batch_format="pyarrow"),
                          ["dow"], [("r", "nf", "sum"), ("n", "n", "sum")])
    tie_tot = float(franks.sum("tie3"))

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "k_groups": pa.array([], pa.int64()),
            "n_total": pa.array([], pa.int64()),
            "h_stat": pa.array([], pa.float64()),
            "h_tie_corrected": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("dow", "ascending")])
        r = t.column("r").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        nt = float(n.sum())
        h = 12.0 / (nt * (nt + 1.0)) * float((r * r / n).sum()) \
            - 3.0 * (nt + 1.0)
        corr = 1.0 - tie_tot / (nt ** 3 - nt)
        hc = h / corr if corr > 0.0 else None
        out = pa.table({
            "k_groups": pa.array([len(n)], pa.int64()),
            "n_total": pa.array([int(nt)], pa.int64()),
            "h_stat": pa.array([h], pa.float64()),
            "h_tie_corrected": pa.array([hc], pa.float64()),
        })
        for name in ("h_stat", "h_tie_corrected"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(per_dow.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["k_groups", "n_total", "h_stat",
                            "h_tie_corrected"]),
        batch_format="pyarrow")


QUERIES["q_dow_value_kruskal"] = q_dow_value_kruskal
ORACLE_SQL["q_dow_value_kruskal"] = """
    WITH s AS (
      SELECT (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS dow, value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT dow,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS frank
      FROM s
    ),
    g AS (SELECT dow, sum(frank) AS r, count(*) AS n FROM r GROUP BY 1),
    tie AS (
      SELECT coalesce(sum(CAST(t AS DOUBLE) * t * t - t), 0.0) AS tt
      FROM (SELECT value, count(*) AS t FROM s GROUP BY 1)
    ),
    nn AS (SELECT CAST(sum(n) AS DOUBLE) AS nt, count(*) AS k FROM g),
    h AS (
      SELECT 12.0 / (nt * (nt + 1.0))
               * (SELECT sum(r * r / n) FROM g, nn) - 3.0 * (nt + 1.0)
             AS h_raw
      FROM nn
    )
    SELECT k AS k_groups, CAST(nt AS BIGINT) AS n_total,
           round(h_raw, 6) AS h_stat,
           round(CASE WHEN 1.0 - tt / (nt * nt * nt - nt) > 0
                 THEN h_raw / (1.0 - tt / (nt * nt * nt - nt)) END, 6)
               AS h_tie_corrected
    FROM h, nn, tie
"""


def q_daily_qty_revenue_kendall(sf_dir: str):
    """Kendall tau-b concordance between daily shipped quantity and daily
    revenue — the rank-correlation companion to Spearman built on EXACT
    integer pair counts (concordant/discordant/tie counts never touch a
    float until the final ratio, so the statistic is bitwise
    deterministic).  The lineitem stream collapses to one exact-integer
    row per ship day via the combiner exchange; the O(n²) sign pass runs
    vectorized over that tiny series (n ≈ 2.4k days → 2.9M pairs)."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice"])

    def day_xy(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("l_shipdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        q = pc.cast(pc.round(b.column("l_quantity")), pa.int64())
        c = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"day": day, "q": q, "c": c})

    daily = grouped_agg(li.map_batches(day_xy, batch_format="pyarrow"),
                        ["day"], [("x", "q", "sum"), ("y", "c", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "n_concordant": pa.array([], pa.int64()),
            "n_discordant": pa.array([], pa.int64()),
            "tau_b": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        n = len(x)
        iu, ju = np.triu_indices(n, 1)
        dx = np.sign(x[ju] - x[iu])
        dy = np.sign(y[ju] - y[iu])
        prod = dx * dy
        conc = int((prod > 0).sum())
        disc = int((prod < 0).sum())
        n0 = n * (n - 1) // 2
        _, cx = np.unique(x, return_counts=True)
        _, cy = np.unique(y, return_counts=True)
        n1 = int((cx * (cx - 1) // 2).sum())
        n2 = int((cy * (cy - 1) // 2).sum())
        denom = np.sqrt(float(n0 - n1) * float(n0 - n2))
        tau = (conc - disc) / denom if denom > 0.0 else None
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "n_concordant": pa.array([conc], pa.int64()),
            "n_discordant": pa.array([disc], pa.int64()),
            "tau_b": pa.array([tau], pa.float64()),
        })
        idx = out.column_names.index("tau_b")
        return out.set_column(idx, "tau_b",
                              round_like_duckdb(out.column("tau_b"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "n_concordant", "n_discordant",
                            "tau_b"]),
        batch_format="pyarrow")


QUERIES["q_daily_qty_revenue_kendall"] = q_daily_qty_revenue_kendall
ORACLE_SQL["q_daily_qty_revenue_kendall"] = """
    WITH d AS (
      SELECT CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(l_quantity) AS BIGINT)) AS x,
             sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS y
      FROM lineitem GROUP BY 1
    ),
    p AS (
      SELECT sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                      THEN 1 ELSE 0 END) AS conc,
             sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                      THEN 1 ELSE 0 END) AS disc
      FROM d a JOIN d b ON b.day > a.day
    ),
    nn AS (SELECT count(*) AS n FROM d),
    tx AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n1
           FROM (SELECT x, count(*) AS t FROM d GROUP BY 1) WHERE t > 1),
    ty AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n2
           FROM (SELECT y, count(*) AS t FROM d GROUP BY 1) WHERE t > 1)
    SELECT n AS n_days,
           CAST(conc AS BIGINT) AS n_concordant,
           CAST(disc AS BIGINT) AS n_discordant,
           round((conc - disc)
                 / sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE)
                        * CAST(n * (n - 1) // 2 - n2 AS DOUBLE)), 6)
               AS tau_b
    FROM p, nn, tx, ty
"""


def q_purchase_value_stump(sf_dir: str):
    """Decision-stump induction: the single best value-threshold split
    separating purchase events from the rest, by Gini impurity reduction
    — the CART building block as a distributed threshold search.  The
    distinct-value combiner ships |distinct| (n, positives) rows; a range
    sort + two global prefix sums give every candidate split's left/right
    class counts; the gain expression runs on EXACT integer counts with
    an identical op tree on both sides, so the argmax is bitwise
    deterministic (no tie ambiguity)."""
    from ..stages.agg import global_topk, grouped_agg, round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        return pa.table({
            "value": b.column("value"),
            "lab": pc.cast(pc.equal(b.column("event_type"),
                                    pa.scalar("purchase")), pa.int64()),
        })

    base = ev.map_batches(proj, batch_format="pyarrow")
    # |distinct values| rows; materialized once — read by both the totals
    # action and the range sort (no combiner re-execution)
    g = grouped_agg(base, ["value"], [("n", "value", "count"),
                                      ("p", "lab", "sum")]).materialize()
    totals = g.sum(["n", "p"])
    nt, pt = float(totals["sum(n)"]), float(totals["sum(p)"])

    s = range_sort(g, "value")
    s = global_prefix_sums(s, "n", out_name="__nl", exclusive=False)
    s = global_prefix_sums(s, "p", out_name="__pl", exclusive=False)

    def score(b: pa.Table) -> pa.Table:
        nl = b.column("__nl").to_numpy(zero_copy_only=False).astype(np.float64)
        pl = b.column("__pl").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = nl < nt                       # right side must be non-empty
        v = b.column("value").to_numpy(zero_copy_only=False)[keep]
        nl, pl = nl[keep], pl[keep]
        nr, pr = nt - nl, pt - pl
        gp = 1.0 - (pt / nt) * (pt / nt) \
            - ((nt - pt) / nt) * ((nt - pt) / nt)
        gl = 1.0 - (pl / nl) * (pl / nl) \
            - ((nl - pl) / nl) * ((nl - pl) / nl)
        gr = 1.0 - (pr / nr) * (pr / nr) \
            - ((nr - pr) / nr) * ((nr - pr) / nr)
        gain = gp - ((nl / nt) * gl + (nr / nt) * gr)
        return pa.table({
            "split_value": pa.array(v, pa.float64()),
            "n_left": pa.array(nl.astype(np.int64)),
            "n_right": pa.array(nr.astype(np.int64)),
            "__gain": pa.array(gain, pa.float64()),
        })

    scored = s.map_batches(score, batch_format="pyarrow")
    top = global_topk(scored, ["__gain", "split_value"], 1,
                      descending=[True, False])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "split_value": b.column("split_value"),
            "n_left": b.column("n_left"),
            "n_right": b.column("n_right"),
            "gini_gain": round_like_duckdb(b.column("__gain"), 6),
        })

    return top.map_batches(finish, batch_format="pyarrow")


QUERIES["q_purchase_value_stump"] = q_purchase_value_stump
ORACLE_SQL["q_purchase_value_stump"] = """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events WHERE value IS NOT NULL
    ),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS nt,
                 CAST(sum(lab) AS DOUBLE) AS pt FROM s),
    g AS (SELECT value, count(*) AS n, sum(lab) AS p FROM s GROUP BY 1),
    c AS (
      SELECT value,
             CAST(sum(n) OVER (ORDER BY value) AS DOUBLE) AS nl,
             CAST(sum(p) OVER (ORDER BY value) AS DOUBLE) AS pl
      FROM g
    ),
    e AS (
      SELECT value, nl, pl, nt - nl AS nr, pt - pl AS pr, nt, pt
      FROM c, t WHERE nl < nt
    ),
    sc AS (
      SELECT value, nl, nr,
             (1.0 - (pt / nt) * (pt / nt)
                  - ((nt - pt) / nt) * ((nt - pt) / nt))
             - ((nl / nt) * (1.0 - (pl / nl) * (pl / nl)
                                 - ((nl - pl) / nl) * ((nl - pl) / nl))
                + (nr / nt) * (1.0 - (pr / nr) * (pr / nr)
                                   - ((nr - pr) / nr) * ((nr - pr) / nr)))
                 AS gain
      FROM e
    )
    SELECT value AS split_value, CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right, round(gain, 6) AS gini_gain
    FROM sc ORDER BY gain DESC, value LIMIT 1
"""


def q_weekly_new_vs_returning(sf_dir: str):
    """Weekly revenue split into NEW users (first-ever value-bearing
    event falls in this week) vs RETURNING users — the growth-accounting
    staple.  Per-user first week is one keyed MIN aggregate joined back
    onto the stream (co-partitioned hash join); weekly splits are
    exact-integer-cents conditional sums, so every number is
    deterministic."""
    from ..stages.agg import grouped_agg, round_like_duckdb
    from ..stages.joins import hash_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        return pa.table({
            "user_id": b.column("user_id"),
            "week": _epoch_week(b.column("ts")),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("value"), pa.scalar(100.0, pa.float64()))),
                pa.int64()),
        })

    w = ev.map_batches(proj, batch_format="pyarrow")
    first = grouped_agg(w, ["user_id"], [("fw", "week", "min")])
    j = hash_join(w, first, left_key="user_id", right_key="user_id",
                  how="inner")

    def split(b: pa.Table) -> pa.Table:
        is_new = pc.equal(b.column("week"), b.column("fw"))
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "week": b.column("week"),
            "new_c": pc.if_else(is_new, b.column("c"), zero),
            "ret_c": pc.if_else(is_new, zero, b.column("c")),
            "c": b.column("c"),
        })

    g = grouped_agg(j.map_batches(split, batch_format="pyarrow"),
                    ["week"],
                    [("n_events", "c", "count"), ("new_c", "new_c", "sum"),
                     ("ret_c", "ret_c", "sum"), ("tot_c", "c", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        share = pc.divide(
            pc.multiply(pc.cast(b.column("new_c"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pc.cast(b.column("tot_c"), pa.float64()))
        return pa.table({
            "week": b.column("week"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "new_value": pc.divide(pc.cast(b.column("new_c"), pa.float64()),
                                   pa.scalar(100.0, pa.float64())),
            "returning_value": pc.divide(
                pc.cast(b.column("ret_c"), pa.float64()),
                pa.scalar(100.0, pa.float64())),
            "new_share": round_like_duckdb(share, 6),
        })

    return g.map_batches(finish, batch_format="pyarrow")


QUERIES["q_weekly_new_vs_returning"] = q_weekly_new_vs_returning
ORACLE_SQL["q_weekly_new_vs_returning"] = """
    WITH w AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS week,
             CAST(round(value * 100.0) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    f AS (SELECT user_id, min(week) AS fw FROM w GROUP BY 1)
    SELECT week, count(*) AS n_events,
           CAST(sum(CASE WHEN week = fw THEN c ELSE 0 END) AS DOUBLE)
             / 100.0 AS new_value,
           CAST(sum(CASE WHEN week > fw THEN c ELSE 0 END) AS DOUBLE)
             / 100.0 AS returning_value,
           round(sum(CASE WHEN week = fw THEN c ELSE 0 END) * 1.0
                 / sum(c), 6) AS new_share
    FROM w JOIN f USING (user_id) GROUP BY 1
"""


def q_daily_revenue_holt(sf_dir: str):
    """Holt linear-trend exponential smoothing (α=0.3, β=0.1) over the
    daily revenue series, with the one-step-ahead forecast — the
    double-exponential upgrade of the EWMA query.  The raw order stream
    collapses to the shared exact-cents daily table; the inherently
    sequential recurrence then runs over that tiny series in one
    partition, mirroring the oracle's recursive CTE op-for-op (both
    sides evaluate the identical expression tree, so the smoothed path
    is bitwise deterministic)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    A = 0.3
    B = 0.1

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "day": pa.array([], pa.int64()),
            "level": pa.array([], pa.float64()),
            "trend": pa.array([], pa.float64()),
            "forecast_next": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        d = t.column("day").to_numpy(zero_copy_only=False)
        y = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64) \
            / 100.0
        n = len(y)
        levels = np.empty(n)
        trends = np.empty(n)
        levels[0] = y[0]
        trends[0] = y[1] - y[0]
        for i in range(1, n):
            # identical op tree to the recursive CTE: l' computed once,
            # referenced twice
            lnew = A * y[i] + (1 - A) * (levels[i - 1] + trends[i - 1])
            levels[i] = lnew
            trends[i] = B * (lnew - levels[i - 1]) + (1 - B) * trends[i - 1]
        out = pa.table({
            "day": pa.array(d, pa.int64()),
            "level": pa.array(levels, pa.float64()),
            "trend": pa.array(trends, pa.float64()),
            "forecast_next": pa.array(levels + trends, pa.float64()),
        })
        for name in ("level", "trend", "forecast_next"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["day", "level", "trend", "forecast_next"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_holt"] = q_daily_revenue_holt
ORACLE_SQL["q_daily_revenue_holt"] = """
    WITH RECURSIVE d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT day, CAST(c AS DOUBLE) / 100.0 AS y,
             row_number() OVER (ORDER BY day) AS rn
      FROM d
    ),
    r AS (
      SELECT s1.day, s1.rn, s1.y AS l, s2.y - s1.y AS b
      FROM s s1, s s2 WHERE s1.rn = 1 AND s2.rn = 2
      UNION ALL
      SELECT s.day, s.rn,
             0.3 * s.y + (1 - 0.3) * (r.l + r.b),
             0.1 * ((0.3 * s.y + (1 - 0.3) * (r.l + r.b)) - r.l)
               + (1 - 0.1) * r.b
      FROM r JOIN s ON s.rn = r.rn + 1
    )
    SELECT day, round(l, 6) AS level, round(b, 6) AS trend,
           round(l + b, 6) AS forecast_next
    FROM r
"""


def q_embedding_label_silhouette(sf_dir: str):
    """Per-class silhouette score on rounded-4 cosine distance — the
    clustering-quality grade (how tightly each labeled class sits apart
    from its nearest other class).  ONE matmul pass per block against the
    broadcast normalized matrix; each point's per-label distance sums
    fold through a single B×L matmul (the pairwise matrix is never
    materialized past the block); a(i)/b(i)/s(i) finalize vectorized and
    a per-label mean combiner closes.  Singleton-class points drop
    (silhouette undefined), matching the oracle's NULL filter."""
    import ray

    from ..stages.agg import grouped_agg
    from ..stages.ann import _normalize, _stack

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    tabs = [t for t in ray.get(emb.to_arrow_refs()) if t.num_columns > 0]
    full = pa.concat_tables(tabs)
    labs = full.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    ulabs, lab_idx = np.unique(labs, return_inverse=True)
    onehot = np.zeros((len(labs), len(ulabs)))
    onehot[np.arange(len(labs)), lab_idx] = 1.0
    counts = onehot.sum(axis=0)
    ref = ray.put((_normalize(_stack(full)), onehot, counts, ulabs))

    def sil(b: pa.Table) -> pa.Table:
        import ray as _ray

        a_mat, oh, cnts, ul = _ray.get(ref)
        q_labs = b.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        own = np.searchsorted(ul, q_labs)
        d = 1.0 - np.round(_normalize(_stack(b)) @ a_mat.T, 4)
        sums = d @ oh                                   # B × L label sums
        keep = cnts[own] > 1.0
        if not keep.any():
            return pa.table({"label": pa.array([], pa.int64()),
                             "sil": pa.array([], pa.float64())})
        own, sums, q_labs = own[keep], sums[keep], q_labs[keep]
        rows = np.arange(len(own))
        a = sums[rows, own] / (cnts[own] - 1.0)
        means = sums / cnts[None, :]
        means[rows, own] = np.inf
        bm = means.min(axis=1)
        s = np.where(bm > a, (bm - a) / bm,
                     np.where(a > bm, (bm - a) / a, 0.0))
        return pa.table({"label": pa.array(q_labs, pa.int64()),
                         "sil": pa.array(s, pa.float64())})

    scored = emb.map_batches(sil, batch_format="pyarrow")
    return grouped_agg(scored, ["label"],
                       [("n_points", "sil", "count"),
                        ("mean_silhouette", "sil", "mean")],
                       round_to=6)


QUERIES["q_embedding_label_silhouette"] = q_embedding_label_silhouette
ORACLE_SQL["q_embedding_label_silhouette"] = """
    WITH p AS (
      SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
             1.0 - round(list_cosine_similarity(
                     CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])), 4) AS d
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    m AS (
      SELECT i, li, lj, sum(d) AS sd, count(*) AS nd
      FROM p GROUP BY 1, 2, 3
    ),
    ab AS (
      SELECT i, li,
             max(CASE WHEN li = lj THEN sd / nd END) AS a,
             min(CASE WHEN li <> lj THEN sd / nd END) AS b
      FROM m GROUP BY 1, 2
    ),
    s AS (
      SELECT li AS label,
             CASE WHEN b > a THEN (b - a) / b
                  WHEN a > b THEN (b - a) / a
                  ELSE 0.0 END AS sil
      FROM ab WHERE a IS NOT NULL AND b IS NOT NULL
    )
    SELECT label, count(*) AS n_points,
           round(avg(sil), 6) AS mean_silhouette
    FROM s GROUP BY 1
"""


def _arm_lifetime_death_table(sf_dir: str):
    """Per-day per-arm user-lifetime death counts (days, da, db) — the
    hash-split survival preamble shared by the log-rank test and the
    per-arm Kaplan-Meier curves: one keyed lifetime aggregate, the split
    column, and one combiner exchange."""
    from ..stages.agg import grouped_agg
    from ..stages.sample import deterministic_split

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    life = grouped_agg(ev, ["user_id"], [("first_ts", "ts", "min"),
                                         ("last_ts", "ts", "max")])
    sp = deterministic_split(life, id_col="user_id",
                             splits=[("A", 0.5), ("B", 0.5)], seed="ab1",
                             out_col="arm")

    def days_arm(b: pa.Table) -> pa.Table:
        us0 = pc.cast(b.column("first_ts"), pa.int64())
        us1 = pc.cast(b.column("last_ts"), pa.int64())
        days = pc.divide(pc.subtract(us1, us0),
                         pa.scalar(86_400_000_000, pa.int64()))
        ia = pc.cast(pc.equal(b.column("arm"), pa.scalar("A")), pa.int64())
        return pa.table({"days": days, "ia": ia,
                         "ib": pc.subtract(pa.scalar(1, pa.int64()), ia)})

    return grouped_agg(sp.map_batches(days_arm, batch_format="pyarrow"),
                       ["days"], [("da", "ia", "sum"), ("db", "ib", "sum")])


def q_user_lifetime_logrank(sf_dir: str):
    """Log-rank test between the two hash-split arms' user-lifetime
    distributions — the hypothesis-test companion to the Kaplan-Meier and
    Nelson-Aalen queries (same split as q_ab_value_ttest, so the expected
    answer is "no difference").  Per-user lifetimes are one keyed
    aggregate, per-day per-arm death counts one combiner exchange; the
    ≤|distinct days| table finalizes in one partition: at-risk counts via
    exclusive cumsums, per-time hypergeometric expectation/variance, and
    χ² = (O_A − E_A)²/V."""
    from ..stages.agg import grouped_map, round_like_duckdb

    d = _arm_lifetime_death_table(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "observed_a": pa.array([], pa.int64()),
            "expected_a": pa.array([], pa.float64()),
            "chi2_logrank": pa.array([], pa.float64()),
            "hazard_ratio": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("days", "ascending")])
        da = t.column("da").to_numpy(zero_copy_only=False).astype(np.float64)
        db = t.column("db").to_numpy(zero_copy_only=False).astype(np.float64)
        tna, tnb = float(da.sum()), float(db.sum())
        if tna == 0.0 or tnb == 0.0:
            return empty
        na = tna - np.concatenate(([0.0], np.cumsum(da)[:-1]))
        nb = tnb - np.concatenate(([0.0], np.cumsum(db)[:-1]))
        dt = da + db
        n = na + nb
        ea = float((dt * (na / n)).sum())
        mask = n > 1.0
        v = float((dt[mask] * (na[mask] / n[mask]) * (nb[mask] / n[mask])
                   * (n[mask] - dt[mask]) / (n[mask] - 1.0)).sum())
        oa = float(da.sum())
        chi2 = (oa - ea) * (oa - ea) / v if v > 0.0 else None
        dtot = tna + tnb
        hr = ((oa / ea) / ((dtot - oa) / (dtot - ea))
              if ea > 0.0 and dtot > oa and dtot > ea else None)
        out = pa.table({
            "n_a": pa.array([int(tna)], pa.int64()),
            "n_b": pa.array([int(tnb)], pa.int64()),
            "observed_a": pa.array([int(oa)], pa.int64()),
            "expected_a": pa.array([ea], pa.float64()),
            "chi2_logrank": pa.array([chi2], pa.float64()),
            "hazard_ratio": pa.array([hr], pa.float64()),
        })
        for name in ("expected_a", "chi2_logrank", "hazard_ratio"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(d.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_a", "n_b", "observed_a", "expected_a",
                            "chi2_logrank", "hazard_ratio"]),
        batch_format="pyarrow")


QUERIES["q_user_lifetime_logrank"] = q_user_lifetime_logrank
ORACLE_SQL["q_user_lifetime_logrank"] = f"""
    WITH u AS (
      SELECT user_id,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS days
      FROM events GROUP BY 1
    ),
    a AS (SELECT days, {_ab_split_case()} AS arm FROM u),
    d AS (
      SELECT days,
             sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS da,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS db
      FROM a GROUP BY 1
    ),
    tt AS (SELECT sum(da) AS tna, sum(db) AS tnb FROM d),
    w AS (
      SELECT days, da, db,
             tna - (sum(da) OVER (ORDER BY days) - da) AS na,
             tnb - (sum(db) OVER (ORDER BY days) - db) AS nb
      FROM d, tt
    ),
    s AS (
      SELECT sum(da) AS oa,
             sum((da + db) * (na / (na + nb))) AS ea,
             sum(CASE WHEN na + nb > 1 THEN
                   (da + db) * (na / (na + nb)) * (nb / (na + nb))
                     * ((na + nb) - (da + db)) / ((na + nb) - 1)
                 ELSE 0 END) AS v
      FROM w
    )
    SELECT CAST(tna AS BIGINT) AS n_a, CAST(tnb AS BIGINT) AS n_b,
           CAST(oa AS BIGINT) AS observed_a,
           round(ea, 6) AS expected_a,
           round((oa - ea) * (oa - ea) / v, 6) AS chi2_logrank,
           round((oa / ea)
                 / (((tna + tnb) - oa) / ((tna + tnb) - ea)), 6)
               AS hazard_ratio
    FROM s, tt
"""


def q_doc_type_token_ratio(sf_dir: str):
    """Lexical diversity per language: mean per-doc type-token ratio
    (distinct tokens / tokens — the corpus-quality screen that catches
    word-salad and boilerplate).  Fully vectorized per batch: one Arrow
    split, a dictionary encode of the flattened tokens, and one lexsort
    adjacent-diff pass counts distinct codes per doc (no per-doc Python
    loop); per-doc ratios are exact integer quotients so only the final
    per-lang mean is a float fold."""
    from ..stages.agg import grouped_agg

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def ttr(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = pc.list_flatten(toks).combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        order = np.lexsort((codes, doc_idx))
        di, cd = doc_idx[order], codes[order]
        new = np.ones(len(di), bool)
        new[1:] = (di[1:] != di[:-1]) | (cd[1:] != cd[:-1])
        distinct = np.bincount(di[new], minlength=len(lens))
        return pa.table({
            "lang": b.column("lang"),
            "ttr": pa.array(distinct / lens, pa.float64()),
        })

    scored = docs.map_batches(ttr, batch_format="pyarrow")
    return grouped_agg(scored, ["lang"],
                       [("n_docs", "ttr", "count"),
                        ("avg_ttr", "ttr", "mean")],
                       round_to=6)


QUERIES["q_doc_type_token_ratio"] = q_doc_type_token_ratio
ORACLE_SQL["q_doc_type_token_ratio"] = """
    SELECT lang, count(*) AS n_docs,
           round(avg(len(list_distinct(string_split(text, ' ')))
                     * 1.0 / len(string_split(text, ' '))), 6) AS avg_ttr
    FROM documents GROUP BY 1
"""


def q_event_type_entropy_rate(sf_dir: str):
    """Entropy rate (nats) of the first-order event-type Markov chain —
    how predictable the next action is given the current one, the
    sequence-complexity score of a behavioral corpus.  Reuses the
    transition-count pipeline (per-user vectorized shift + tiny (src,dst)
    combiner); H = −Σᵢⱼ (nᵢⱼ/N)·ln(nᵢⱼ/nᵢ·) finalizes over the ≤|types|²
    cell table."""
    from ..stages.agg import grouped_map, round_like_duckdb

    counts = q_event_type_transitions(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_transitions": pa.array([], pa.int64()),
            "n_states": pa.array([], pa.int64()),
            "entropy_rate_nats": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        src = t.column("src_type").to_numpy(zero_copy_only=False)
        n = t.column("n_transitions").to_numpy(
            zero_copy_only=False).astype(np.float64)
        nt = float(n.sum())
        us, si = np.unique(src, return_inverse=True)
        rowsum = np.zeros(len(us))
        np.add.at(rowsum, si, n)
        h = -float(((n / nt) * np.log(n / rowsum[si])).sum())
        s = 10.0 ** 6
        h = float(np.copysign(np.floor(abs(h) * s + 0.5), h) / s)
        return pa.table({
            "n_transitions": pa.array([int(nt)], pa.int64()),
            "n_states": pa.array([len(us)], pa.int64()),
            "entropy_rate_nats": pa.array([h], pa.float64()),
        })

    out = grouped_map(counts.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_transitions", "n_states",
                            "entropy_rate_nats"]),
        batch_format="pyarrow")


QUERIES["q_event_type_entropy_rate"] = q_event_type_entropy_rate
ORACLE_SQL["q_event_type_entropy_rate"] = """
    WITH p AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src,
             event_type AS dst
      FROM events
    ),
    c AS (SELECT src, dst, count(*) AS n FROM p WHERE src IS NOT NULL
          GROUP BY 1, 2),
    r AS (SELECT src, sum(n) AS rn FROM c GROUP BY 1),
    t AS (SELECT sum(n) AS nt FROM c)
    SELECT CAST(nt AS BIGINT) AS n_transitions,
           (SELECT count(*) FROM r) AS n_states,
           round(-sum((n / nt) * ln(n / rn)), 6) AS entropy_rate_nats
    FROM c JOIN r USING (src), t
    GROUP BY nt
"""


def _click_period_flags(sf_dir: str):
    """Per-user (clicked-in-first-half, clicked-in-second-half) flags —
    the midpoint-split paired-binary preamble shared by the McNemar test
    and the Cohen's-kappa agreement query (same time bound as CUPED).
    One keyed conditional-MAX aggregate; returns (user_id, f1, f2)."""
    from ..stages.agg import grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    bounds = grouped_agg(
        ev.map_batches(
            lambda b: pa.table({
                "__g": pa.array(np.zeros(b.num_rows, np.int8)),
                "us": pc.cast(b.column("ts"), pa.int64())}),
            batch_format="pyarrow"),
        ["__g"], [("mn", "us", "min"), ("mx", "us", "max")]).take_all()
    mid = (bounds[0]["mn"] + bounds[0]["mx"]) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        is_click = pc.equal(b.column("event_type"), pa.scalar("click"))
        early = pc.less(us, pa.scalar(mid, pa.int64()))
        return pa.table({
            "user_id": b.column("user_id"),
            "c1": pc.cast(pc.and_(is_click, early), pa.int64()),
            "c2": pc.cast(pc.and_(is_click, pc.invert(early)), pa.int64()),
        })

    return grouped_agg(ev.map_batches(flags, batch_format="pyarrow"),
                       ["user_id"],
                       [("f1", "c1", "max"), ("f2", "c2", "max")])


def q_click_mcnemar(sf_dir: str):
    """McNemar's paired test on click behavior between the first and
    second half of the observation window (midpoint split, same time
    bound as the CUPED query): did individual users' clicking switch
    on/off asymmetrically?  Per-user before/after flags are one keyed
    conditional-MAX aggregate; the 2×2 discordant cells finalize from a
    4-row table; χ² = (b−c)²/(b+c) plus the continuity-corrected
    variant."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    u = _click_period_flags(sf_dir)

    def cell(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "both": pc.multiply(b.column("f1"), b.column("f2")),
            "first_only": pc.multiply(
                b.column("f1"),
                pc.subtract(pa.scalar(1, pa.int64()), b.column("f2"))),
            "second_only": pc.multiply(
                pc.subtract(pa.scalar(1, pa.int64()), b.column("f1")),
                b.column("f2")),
        })

    g = grouped_agg(u.map_batches(cell, batch_format="pyarrow"), ["__g"],
                    [("n_users", "both", "count"), ("n_both", "both", "sum"),
                     ("b", "first_only", "sum"), ("c", "second_only", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_users": pa.array([], pa.int64()),
            "n_both": pa.array([], pa.int64()),
            "n_first_only": pa.array([], pa.int64()),
            "n_second_only": pa.array([], pa.int64()),
            "chi2_mcnemar": pa.array([], pa.float64()),
            "chi2_corrected": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        b, c = float(r["b"]), float(r["c"])
        chi2 = (b - c) * (b - c) / (b + c) if b + c > 0 else None
        corr = ((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c)
                if b + c > 0 else None)
        out = pa.table({
            "n_users": pa.array([int(r["n_users"])], pa.int64()),
            "n_both": pa.array([int(r["n_both"])], pa.int64()),
            "n_first_only": pa.array([int(b)], pa.int64()),
            "n_second_only": pa.array([int(c)], pa.int64()),
            "chi2_mcnemar": pa.array([chi2], pa.float64()),
            "chi2_corrected": pa.array([corr], pa.float64()),
        })
        for name in ("chi2_mcnemar", "chi2_corrected"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    # g already carries the constant __g key from the aggregate
    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_users", "n_both", "n_first_only",
                            "n_second_only", "chi2_mcnemar",
                            "chi2_corrected"]),
        batch_format="pyarrow")


QUERIES["q_click_mcnemar"] = q_click_mcnemar
ORACLE_SQL["q_click_mcnemar"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
    bnd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
    u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click'
                       AND us < (SELECT mid FROM bnd)
                      THEN 1 ELSE 0 END) AS f1,
             max(CASE WHEN event_type = 'click'
                       AND us >= (SELECT mid FROM bnd)
                      THEN 1 ELSE 0 END) AS f2
      FROM e GROUP BY 1
    ),
    g AS (
      SELECT count(*) AS n_users,
             sum(f1 * f2) AS n_both,
             sum(f1 * (1 - f2)) AS b,
             sum((1 - f1) * f2) AS c
      FROM u
    )
    SELECT n_users, CAST(n_both AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_first_only,
           CAST(c AS BIGINT) AS n_second_only,
           round((b - c) * (b - c) * 1.0 / (b + c), 6) AS chi2_mcnemar,
           round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c), 6)
               AS chi2_corrected
    FROM g
"""


def q_qty_price_partial_corr(sf_dir: str):
    """Partial correlation of quantity and extended price CONTROLLING for
    discount — the confound-removal screen on top of the plain
    correlation: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)).  All
    three pairwise correlations come from ONE mergeable-moment pass over
    the stream; both sides compute the formula from the round-6 r values,
    so the composite is bitwise deterministic."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "x": b.column("l_quantity"),
            "y": b.column("l_extendedprice"),
            "z": b.column("l_discount"),
        })

    g = grouped_agg(li.map_batches(proj, batch_format="pyarrow"), ["__g"],
                    [("r_xy", ("x", "y"), "corr"),
                     ("r_xz", ("x", "z"), "corr"),
                     ("r_yz", ("y", "z"), "corr")], round_to=6)

    def finalize(b: pa.Table) -> pa.Table:
        rxy = b.column("r_xy").to_numpy(zero_copy_only=False)
        rxz = b.column("r_xz").to_numpy(zero_copy_only=False)
        ryz = b.column("r_yz").to_numpy(zero_copy_only=False)
        part = (rxy - rxz * ryz) / np.sqrt(
            (1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        return pa.table({
            "r_xy": b.column("r_xy"),
            "r_xz": b.column("r_xz"),
            "r_yz": b.column("r_yz"),
            "partial_r_xy_z": round_like_duckdb(
                pa.array(part, pa.float64()), 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_qty_price_partial_corr"] = q_qty_price_partial_corr
ORACLE_SQL["q_qty_price_partial_corr"] = """
    WITH r AS (
      SELECT round(corr(l_quantity, l_extendedprice), 6) AS rxy,
             round(corr(l_quantity, l_discount), 6) AS rxz,
             round(corr(l_extendedprice, l_discount), 6) AS ryz
      FROM lineitem
    )
    SELECT rxy AS r_xy, rxz AS r_xz, ryz AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
               AS partial_r_xy_z
    FROM r
"""


def q_segment_priority_residuals(sf_dir: str):
    """Adjusted standardized residuals of the segment×priority
    contingency table — WHICH cells drive the chi-square (the insight
    layer on top of q_segment_priority_chi2): rᵢⱼ = (o−e)/√(e(1−nᵢ/N)
    (1−nⱼ/N)), top-5 observed cells by |r|.  One broadcast dim join +
    one contingency combiner; the ≤|cells| table finalizes in one
    partition on exact integer margins, so the ranking is bitwise
    deterministic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_mktsegment"])
    c = grouped_agg(j, ["c_mktsegment", "o_orderpriority"],
                    [("o", "o_custkey", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "c_mktsegment": pa.array([], pa.string()),
            "o_orderpriority": pa.array([], pa.string()),
            "observed": pa.array([], pa.int64()),
            "expected": pa.array([], pa.float64()),
            "adj_residual": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        o = t.column("o").to_numpy(zero_copy_only=False).astype(np.int64)
        us, si = np.unique(seg, return_inverse=True)
        up, pi = np.unique(pri, return_inverse=True)
        nr = np.zeros(len(us), np.int64)
        nc = np.zeros(len(up), np.int64)
        np.add.at(nr, si, o)
        np.add.at(nc, pi, o)
        nt = o.sum()
        e = (nr[si] * nc[pi]) / nt
        ar = (o - e) / np.sqrt(e * (1 - nr[si] / nt) * (1 - nc[pi] / nt))
        order = np.lexsort((pri, seg, -np.abs(ar)))[:5]
        out = pa.table({
            "c_mktsegment": pa.array(seg[order], pa.string()),
            "o_orderpriority": pa.array(pri[order], pa.string()),
            "observed": pa.array(o[order], pa.int64()),
            "expected": pa.array(e[order], pa.float64()),
            "adj_residual": pa.array(ar[order], pa.float64()),
        })
        for name in ("expected", "adj_residual"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(c.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["c_mktsegment", "o_orderpriority", "observed",
                            "expected", "adj_residual"]),
        batch_format="pyarrow")


QUERIES["q_segment_priority_residuals"] = q_segment_priority_residuals
ORACLE_SQL["q_segment_priority_residuals"] = """
    WITH j AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS prio
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    c AS (SELECT seg, prio, count(*) AS o FROM j GROUP BY 1, 2),
    r AS (SELECT seg, sum(o) AS nr FROM c GROUP BY 1),
    k AS (SELECT prio, sum(o) AS nc FROM c GROUP BY 1),
    t AS (SELECT sum(o) AS nt FROM c),
    e AS (
      SELECT seg, prio, o, (nr * nc) / nt AS exp_,
             (o - (nr * nc) / nt)
               / sqrt(((nr * nc) / nt) * (1 - nr / nt) * (1 - nc / nt))
                 AS ar
      FROM c JOIN r USING (seg) JOIN k USING (prio), t
    )
    SELECT seg AS c_mktsegment, prio AS o_orderpriority,
           CAST(o AS BIGINT) AS observed, round(exp_, 6) AS expected,
           round(ar, 6) AS adj_residual
    FROM e ORDER BY abs(ar) DESC, seg, prio LIMIT 5
"""


def q_user_lifetime_km_arms(sf_dir: str):
    """Per-arm Kaplan-Meier survival curves over the hash-split user
    lifetimes — the visual companion to q_user_lifetime_logrank (same
    shared per-day per-arm death table): S_arm(t) = Π(1 − d/n) per arm,
    computed over the ≤|distinct days| table in one partition with the
    exact ln/exp sequence of the global KM query (cell-exact)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    d = _arm_lifetime_death_table(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "days": pa.array([], pa.int64()),
            "n_at_risk_a": pa.array([], pa.int64()),
            "d_a": pa.array([], pa.int64()),
            "survival_a": pa.array([], pa.float64()),
            "n_at_risk_b": pa.array([], pa.int64()),
            "d_b": pa.array([], pa.int64()),
            "survival_b": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("days", "ascending")])
        days = t.column("days").to_numpy(zero_copy_only=False)
        da = t.column("da").to_numpy(zero_copy_only=False).astype(np.float64)
        db = t.column("db").to_numpy(zero_copy_only=False).astype(np.float64)

        def curve(d):
            tn = float(d.sum())
            n = tn - np.concatenate(([0.0], np.cumsum(d)[:-1]))
            with np.errstate(divide="ignore", invalid="ignore"):
                f = np.where(n > 0.0, 1.0 - d * 1.0 / n, 1.0)
            lnf = np.where(f > 0.0, np.log(np.maximum(f, 1e-300)), 0.0)
            surv = np.where(f == 0.0, 0.0, np.exp(np.cumsum(lnf)))
            return n, surv

        na, sa = curve(da)
        nb, sb = curve(db)
        out = pa.table({
            "days": pa.array(days, pa.int64()),
            "n_at_risk_a": pa.array(na.astype(np.int64)),
            "d_a": pa.array(da.astype(np.int64)),
            "survival_a": pa.array(sa, pa.float64()),
            "n_at_risk_b": pa.array(nb.astype(np.int64)),
            "d_b": pa.array(db.astype(np.int64)),
            "survival_b": pa.array(sb, pa.float64()),
        })
        for name in ("survival_a", "survival_b"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(d.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["days", "n_at_risk_a", "d_a", "survival_a",
                            "n_at_risk_b", "d_b", "survival_b"]),
        batch_format="pyarrow")


QUERIES["q_user_lifetime_km_arms"] = q_user_lifetime_km_arms
ORACLE_SQL["q_user_lifetime_km_arms"] = f"""
    WITH u AS (
      SELECT user_id,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000 AS days
      FROM events GROUP BY 1
    ),
    a AS (SELECT days, {_ab_split_case()} AS arm FROM u),
    d AS (
      SELECT days,
             sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS da,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS db
      FROM a GROUP BY 1
    ),
    tt AS (SELECT sum(da) * 1.0 AS tna, sum(db) * 1.0 AS tnb FROM d),
    c AS (
      SELECT days, da, db,
             tna - (sum(da) OVER (ORDER BY days) - da) AS na,
             tnb - (sum(db) OVER (ORDER BY days) - db) AS nb
      FROM d, tt
    ),
    f AS (
      SELECT days, da, db, na, nb,
             CASE WHEN na > 0 THEN 1.0 - da * 1.0 / na ELSE 1.0 END AS fa,
             CASE WHEN nb > 0 THEN 1.0 - db * 1.0 / nb ELSE 1.0 END AS fb
      FROM c
    )
    SELECT days,
           CAST(na AS BIGINT) AS n_at_risk_a, CAST(da AS BIGINT) AS d_a,
           CASE WHEN fa = 0 THEN 0.0
                ELSE round(exp(sum(CASE WHEN fa > 0 THEN ln(fa) ELSE 0 END)
                               OVER (ORDER BY days)), 6)
           END AS survival_a,
           CAST(nb AS BIGINT) AS n_at_risk_b, CAST(db AS BIGINT) AS d_b,
           CASE WHEN fb = 0 THEN 0.0
                ELSE round(exp(sum(CASE WHEN fb > 0 THEN ln(fb) ELSE 0 END)
                               OVER (ORDER BY days)), 6)
           END AS survival_b
    FROM f
"""


def q_monthly_top10_part_share(sf_dir: str):
    """Revenue-concentration trend: each month's share of revenue held by
    its top-10 parts — the "is the catalog concentrating?" monitor.  One
    (month, part) exact-cents combiner feeds BOTH the per-month top-10
    (map-side-combined grouped_topk, ≤ k·|groups| rows shuffled) and the
    month totals; the share is an exact integer ratio."""
    from ..stages.agg import grouped_agg, grouped_topk, round_like_duckdb
    from ..stages.joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_shipdate", "l_partkey",
                                    "l_extendedprice"])

    def proj(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b.column("l_shipdate"), unit="month")
        c = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"month": month, "l_partkey": b.column("l_partkey"),
                         "c": c})

    # |months × parts| rows; materialized once — read by both the top-10
    # cut and the month totals
    pm = grouped_agg(li.map_batches(proj, batch_format="pyarrow"),
                     ["month", "l_partkey"],
                     [("c", "c", "sum")]).materialize()
    top = grouped_topk(pm, "month", "c", 10, descending=True,
                       tiebreak=["l_partkey"])
    tops = grouped_agg(top, ["month"], [("topc", "c", "sum")])
    tots = grouped_agg(pm, ["month"], [("tot", "c", "sum")])
    j = hash_join(tops, tots, left_key="month", right_key="month",
                  how="inner")

    def finish(b: pa.Table) -> pa.Table:
        share = pc.divide(
            pc.multiply(pc.cast(b.column("topc"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pc.cast(b.column("tot"), pa.float64()))
        return pa.table({
            "month": b.column("month"),
            "top10_value": pc.divide(pc.cast(b.column("topc"), pa.float64()),
                                     pa.scalar(100.0, pa.float64())),
            "total_value": pc.divide(pc.cast(b.column("tot"), pa.float64()),
                                     pa.scalar(100.0, pa.float64())),
            "top10_share": round_like_duckdb(share, 6),
        })

    return j.map_batches(finish, batch_format="pyarrow")


QUERIES["q_monthly_top10_part_share"] = q_monthly_top10_part_share
ORACLE_SQL["q_monthly_top10_part_share"] = """
    WITH pm AS (
      SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
             sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT month, c,
             row_number() OVER (PARTITION BY month
                                ORDER BY c DESC, l_partkey) AS rn
      FROM pm
    ),
    t AS (SELECT month, sum(c) AS tot FROM pm GROUP BY 1),
    s AS (SELECT month, sum(c) AS topc FROM r WHERE rn <= 10 GROUP BY 1)
    SELECT month, CAST(topc AS DOUBLE) / 100.0 AS top10_value,
           CAST(tot AS DOUBLE) / 100.0 AS total_value,
           round(topc * 1.0 / tot, 6) AS top10_share
    FROM s JOIN t USING (month)
"""


def q_click_purchase_ccf(sf_dir: str):
    """Lead-lag cross-correlation: corr(daily clicks_t, daily
    purchases_{t+k}) for k ∈ [−7, 7] — does click volume lead purchase
    volume?  One combiner exchange rolls the stream to exact integer
    daily counts; the 15 lag alignments run vectorized over that tiny
    series (day-VALUE joins via searchsorted, so date gaps pair exactly
    like the SQL equi-join); every moment is an exact integer so the
    correlations are deterministic at round-6."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def proj(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        et = b.column("event_type")
        return pa.table({
            "day": day,
            "c": pc.cast(pc.equal(et, pa.scalar("click")), pa.int64()),
            "p": pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int64()),
        })

    d = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                    ["day"], [("c", "c", "sum"), ("p", "p", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "lag": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "ccf": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("day", "ascending")])
        days = t.column("day").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.float64)
        lags, npairs, ccfs = [], [], []
        for k in range(-7, 8):
            tgt = days + k
            idx = np.searchsorted(days, tgt)
            ok = (idx < len(days))
            ok[ok] = days[idx[ok]] == tgt[ok]
            x, y = c[ok], p[idx[ok]]
            n = float(len(x))
            lags.append(k)
            npairs.append(int(n))
            if n <= 1.0:
                ccfs.append(None)
                continue
            sx, sy = x.sum(), y.sum()
            num = n * (x * y).sum() - sx * sy
            dx = max(n * (x * x).sum() - sx * sx, 0.0)
            dy = max(n * (y * y).sum() - sy * sy, 0.0)
            ccfs.append(num / np.sqrt(dx * dy)
                        if dx > 0.0 and dy > 0.0 else None)
        out = pa.table({
            "lag": pa.array(lags, pa.int64()),
            "n_pairs": pa.array(npairs, pa.int64()),
            "ccf": pa.array(ccfs, pa.float64()),
        })
        idx2 = out.column_names.index("ccf")
        return out.set_column(idx2, "ccf",
                              round_like_duckdb(out.column("ccf"), 6))

    out = grouped_map(d.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["lag", "n_pairs", "ccf"]),
        batch_format="pyarrow")


QUERIES["q_click_purchase_ccf"] = q_click_purchase_ccf
ORACLE_SQL["q_click_purchase_ccf"] = """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1
    ),
    l AS (
      SELECT k.k AS lag, a.c AS x, b.p AS y
      FROM range(-7, 8) k(k)
      JOIN d a ON true
      JOIN d b ON b.day = a.day + k.k
    )
    SELECT lag, count(*) AS n_pairs, round(corr(x, y), 6) AS ccf
    FROM l GROUP BY 1
"""


def q_event_type_brown_forsythe(sf_dir: str):
    """Brown-Forsythe test: do event types differ in value DISPERSION
    (not just mean)?  Levene's test with the median center — per-type
    exact medians (grouped quantile machinery) broadcast back onto the
    stream, then the same one-way ANOVA primitive runs on the absolute
    deviations |x − med|.  Two composable primitives, zero new shuffle
    shapes."""
    from ..stages.agg import grouped_quantiles, oneway_anova

    ev = _read(sf_dir, "events", ["event_type", "value"])
    ev = ev.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")
    med = grouped_quantiles(ev, "event_type", "value", [("med", 0.5)],
                            round_to=6)
    j = broadcast_join(ev, med, left_key="event_type", columns=["med"])

    def absdev(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "z": pc.abs(pc.subtract(b.column("value"), b.column("med"))),
        })

    return oneway_anova(j.map_batches(absdev, batch_format="pyarrow"),
                        "event_type", "z")


QUERIES["q_event_type_brown_forsythe"] = q_event_type_brown_forsythe
ORACLE_SQL["q_event_type_brown_forsythe"] = """
    WITH m AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    z AS (
      SELECT e.event_type, abs(e.value - m.med) AS z
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL
    ),
    g AS (
      SELECT event_type, count(*) AS n, avg(z) AS m, var_samp(z) AS v
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(n) AS nt, sum(n * m) / sum(n) AS gm
      FROM g
    ),
    ss AS (
      SELECT (SELECT sum(n * ((m - gm) * (m - gm))) FROM g, tot) AS ssb,
             (SELECT sum((n - 1.0) * v) FROM g WHERE n > 1) AS ssw
    )
    SELECT (SELECT k FROM tot) AS k_groups,
           CAST((SELECT nt FROM tot) AS BIGINT) AS n_total,
           round(CASE WHEN ssw > 0 THEN (ssb / ((SELECT k FROM tot) - 1.0))
                 / (ssw / ((SELECT nt FROM tot) - (SELECT k FROM tot)))
                 END, 6) AS f_stat,
           round(CASE WHEN ssb + ssw > 0 THEN ssb / (ssb + ssw) END, 6)
               AS eta_sq
    FROM ss
"""


def q_gap_exponential_gof(sf_dir: str):
    """Chi-square goodness-of-fit of inter-event gaps to the exponential
    law (memorylessness screen — the distributional companion to the
    burstiness score): gaps read off inside each user's run (one keyed
    exchange, vectorized diff, materialized once), λ̂ = 1/mean from exact
    integer sums, then each gap lands in its theoretical decile via
    F(x) = 1 − e^{−x/μ} and a 10-cell combiner folds observed counts;
    expected is n/10 per cell."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    empty = pa.table({"gap": pa.array([], pa.int64())})

    def gaps_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = np.ones(t.num_rows, bool)
        keep[bounds[:-1]] = False
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        return pa.table({"gap": pa.array(us[idx] - us[idx - 1], pa.int64())})

    gaps = grouped_map(
        ev, "user_id", gaps_part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64())}),
    ).materialize()
    n = gaps.count()
    if n == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "observed": pa.array([], pa.int64()),
                         "expected": pa.array([], pa.float64()),
                         "chi2_term": pa.array([], pa.float64())})
    mu = float(gaps.sum("gap")) / n

    def bucket_of(b: pa.Table) -> pa.Table:
        g = b.column("gap").to_numpy(zero_copy_only=False)
        f = np.floor((1.0 - np.exp(-(g / mu))) * 10.0)
        return pa.table({"bucket": pa.array(
            np.minimum(f, 9.0).astype(np.int64))})

    c = grouped_agg(gaps.map_batches(bucket_of, batch_format="pyarrow"),
                    ["bucket"], [("o", "bucket", "count")])

    def finish(b: pa.Table) -> pa.Table:
        o = pc.cast(b.column("o"), pa.float64())
        e = n / 10.0
        term = pc.divide(pc.multiply(
            pc.subtract(o, pa.scalar(e)), pc.subtract(o, pa.scalar(e))),
            pa.scalar(e))
        return pa.table({
            "bucket": b.column("bucket"),
            "observed": pc.cast(b.column("o"), pa.int64()),
            "expected": round_like_duckdb(
                pa.array(np.full(b.num_rows, e), pa.float64()), 6),
            "chi2_term": round_like_duckdb(term, 6),
        })

    return c.map_batches(finish, batch_format="pyarrow")


QUERIES["q_gap_exponential_gof"] = q_gap_exponential_gof
ORACLE_SQL["q_gap_exponential_gof"] = """
    WITH g AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    gg AS (SELECT gap FROM g WHERE gap IS NOT NULL),
    m AS (SELECT CAST(sum(gap) AS DOUBLE) / count(*) AS mu,
                 count(*) AS n FROM gg),
    b AS (
      SELECT least(CAST(floor((1 - exp(-(gap / mu))) * 10) AS BIGINT), 9)
               AS bucket
      FROM gg, m
    )
    SELECT bucket, count(*) AS observed,
           round(n / 10.0, 6) AS expected,
           round((count(*) - n / 10.0) * (count(*) - n / 10.0)
                 / (n / 10.0), 6) AS chi2_term
    FROM b, m GROUP BY bucket, n
"""


def q_daily_revenue_var_cvar(sf_dir: str):
    """Value-at-Risk and conditional VaR (expected shortfall) of daily
    revenue log-returns — the risk-tail summary of a business series.
    The shared exact-cents daily table collapses the stream; log-returns,
    the interpolated p05 (exact quantile_cont mirror) and the tail mean
    finalize over the tiny series.  The tail is selected against the
    ROUND-6 VaR on both sides, so membership is deterministic."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "n_tail": pa.array([], pa.int64()),
            "var_05": pa.array([], pa.float64()),
            "cvar_05": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False)
        r = np.log(c[1:] / c[:-1])
        rs = np.sort(r)
        h = (len(rs) - 1) * 0.05
        lo = int(np.floor(h))
        var = (rs[lo] if h == lo
               else rs[lo] + (rs[lo + 1] - rs[lo]) * (h - lo))
        s = 10.0 ** 6
        var6 = float(np.copysign(np.floor(abs(var) * s + 0.5), var) / s)
        tail = r[r <= var6]
        cvar = float(tail.sum()) / len(tail) if len(tail) else None
        out = pa.table({
            "n_days": pa.array([len(r)], pa.int64()),
            "n_tail": pa.array([len(tail)], pa.int64()),
            "var_05": pa.array([var6], pa.float64()),
            "cvar_05": pa.array([cvar], pa.float64()),
        })
        idx = out.column_names.index("cvar_05")
        return out.set_column(idx, "cvar_05",
                              round_like_duckdb(out.column("cvar_05"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "n_tail", "var_05", "cvar_05"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_var_cvar"] = q_daily_revenue_var_cvar
ORACLE_SQL["q_daily_revenue_var_cvar"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT ln(c / lag(c) OVER (ORDER BY day)) AS ret
      FROM d
    ),
    rr AS (SELECT ret FROM r WHERE ret IS NOT NULL),
    v AS (SELECT round(quantile_cont(ret, 0.05), 6) AS var6,
                 count(*) AS n FROM rr)
    SELECT n AS n_days,
           (SELECT count(*) FROM rr, v WHERE ret <= var6) AS n_tail,
           var6 AS var_05,
           round((SELECT sum(ret) FROM rr, v WHERE ret <= var6)
                 / (SELECT count(*) FROM rr, v WHERE ret <= var6), 6)
               AS cvar_05
    FROM v
"""


def q_minhash_eval_pr(sf_dir: str):
    """Approximation-quality report for the MinHash+LSH near-dup path:
    precision / recall / F1 of its candidate pairs against the EXACT
    prefix-filter 3-gram Jaccard ≥ 0.8 pairs on the same corpus — the
    harness that justifies running the probabilistic path at 100 TB
    (where the exact join is unaffordable).  Both pair sets are
    distributed pipelines; only the tiny pair lists meet on the driver.
    Rows-only (the LSH banding has no SQL equivalent); the exact side is
    independently DuckDB-oracled as q_ngram_jaccard_pairs."""
    import ray

    from ..stages.sim import minhash_dup_pairs, ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_set(ds):
        tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
        if not tabs:
            return set()
        t = pa.concat_tables(tabs)
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        return {(int(min(x, y)), int(max(x, y))) for x, y in zip(a, b)}

    approx = pair_set(minhash_dup_pairs(docs, threshold=0.8))
    exact = pair_set(ngram_jaccard_pairs(docs, threshold=0.8, n=3))
    tp = len(approx & exact)
    prec = tp / len(approx) if approx else None
    rec = tp / len(exact) if exact else None
    f1 = (2 * prec * rec / (prec + rec)
          if prec is not None and rec is not None and (prec + rec) > 0
          else None)
    return pa.table({
        "n_exact_pairs": pa.array([len(exact)], pa.int64()),
        "n_minhash_pairs": pa.array([len(approx)], pa.int64()),
        "n_true_positive": pa.array([tp], pa.int64()),
        "precision": pa.array([prec], pa.float64()),
        "recall": pa.array([rec], pa.float64()),
        "f1": pa.array([f1], pa.float64()),
    })


QUERIES["q_minhash_eval_pr"] = q_minhash_eval_pr


def q_ann_recall_at_k(sf_dir: str):
    """Retrieval-quality report for the IVF ANN path: recall@10 per query
    (50 held-out corpus vectors) against the exact brute-force top-10 —
    the eval every ANN index needs before it replaces the exact path at
    scale.  Both sides run in ONE data pass each (broadcast query matrix;
    the IVF pass probes 4/16 buckets via the new multi-query prober);
    only the tiny ranked lists meet on the driver.  Rows-only (centroid
    assignment has no SQL equivalent); the single-query exact path is
    independently DuckDB-oracled as q_embedding_topk."""
    import ray

    from ..stages.ann import (_stack, cosine_topk_multi, ivf_assign,
                              ivf_centroids, ivf_topk_multi)

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"], num_blocks=8)
    head = emb.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"),
                                   pa.scalar(50, pa.int64()))),
        batch_format="pyarrow")
    qt = pa.concat_tables(
        [t for t in ray.get(head.to_arrow_refs()) if t.num_columns > 0])
    qt = qt.sort_by([("vec_id", "ascending")])
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qm = _stack(qt)

    truth = cosine_topk_multi(emb, qm, k=11, query_ids=qids, round_to=4)
    cents = ivf_centroids(emb, 16)
    assigned = ivf_assign(emb, cents)
    approx = ivf_topk_multi(assigned, cents, qm, k=11, nprobe=4,
                            query_ids=qids, round_to=4)

    def ranked(ds):
        tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
        t = pa.concat_tables(tabs).sort_by(
            [("query_id", "ascending"), ("sim", "descending"),
             ("vec_id", "ascending")])
        out: dict[int, list[int]] = {}
        for qid, vid in zip(t.column("query_id").to_pylist(),
                            t.column("vec_id").to_pylist()):
            lst = out.setdefault(int(qid), [])
            if vid != qid and len(lst) < 10:   # self excluded, top-10 kept
                lst.append(int(vid))
        return out

    tr, ap = ranked(truth), ranked(approx)
    rows = sorted(tr)
    recalls = [len(set(tr[q]) & set(ap.get(q, []))) / len(tr[q])
               if tr[q] else None for q in rows]
    return pa.table({
        "query_id": pa.array(rows, pa.int64()),
        "recall_at_10": pa.array(recalls, pa.float64()),
    })


QUERIES["q_ann_recall_at_k"] = q_ann_recall_at_k


def q_purchase_shapley_attribution(sf_dir: str):
    """Shapley-value channel attribution — the game-theoretic completion
    of the attribution family (first-touch / last-touch / time-decay /
    position-based): each non-purchase event type is a channel, v(S) is
    the observed conversion rate of users whose touched-channel set is
    exactly S (0 for unseen sets), and φ_channel is the exact Shapley sum
    over all 2^|channels| coalitions.  Distributed part: one distinct
    (user, type) combiner → per-user bitmask fold → |sets| combiner; the
    2^c coalition sweep finalizes on exact integer counts, so every
    value is deterministic."""
    import math

    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    # materialized once: feeds both the channel discovery and the bitmask
    ut = grouped_agg(ev, ["user_id", "event_type"],
                     [("__n", "user_id", "count")]).materialize()

    types = sorted({
        r["event_type"]
        for r in grouped_agg(ut, ["event_type"],
                             [("__n", "event_type", "count")]).take_all()
        if r["event_type"] != "purchase"})
    bit_of = {t: i for i, t in enumerate(types)}
    c = len(types)

    def to_bits(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        bits = np.array([1 << bit_of[t] if t != "purchase" else 0
                         for t in et], np.int64)
        conv = (et == "purchase").astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "bit": pa.array(bits), "conv": pa.array(conv)})

    um = grouped_agg(ut.map_batches(to_bits, batch_format="pyarrow"),
                     ["user_id"],
                     [("mask", "bit", "sum"), ("conv", "conv", "max")])
    sets = grouped_agg(um, ["mask"], [("nu", "mask", "count"),
                                      ("nc", "conv", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({"channel": pa.array([], pa.string()),
                          "shapley": pa.array([], pa.float64())})
        if t.num_rows == 0 or c == 0:
            return empty
        v = np.zeros(1 << c)
        masks = t.column("mask").to_numpy(zero_copy_only=False).astype(int)
        nu = t.column("nu").to_numpy(zero_copy_only=False).astype(np.float64)
        nc = t.column("nc").to_numpy(zero_copy_only=False).astype(np.float64)
        v[masks] = nc * 1.0 / nu
        f = math.factorial
        vals = []
        for i, ch in enumerate(types):
            bit = 1 << i
            phi = 0.0
            for m in range(1 << c):
                if m & bit:
                    continue
                s = bin(m).count("1")
                w = f(s) * f(c - 1 - s) / f(c)
                phi += w * (v[m | bit] - v[m])
            vals.append(phi)
        out = pa.table({"channel": pa.array(types, pa.string()),
                        "shapley": pa.array(vals, pa.float64())})
        idx = out.column_names.index("shapley")
        return out.set_column(idx, "shapley",
                              round_like_duckdb(out.column("shapley"), 6))

    out = grouped_map(sets.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["channel", "shapley"]), batch_format="pyarrow")


QUERIES["q_purchase_shapley_attribution"] = q_purchase_shapley_attribution
ORACLE_SQL["q_purchase_shapley_attribution"] = """
    WITH chn AS (
      SELECT ch, row_number() OVER (ORDER BY ch) - 1 AS bit
      FROM (SELECT DISTINCT event_type AS ch FROM events
            WHERE event_type <> 'purchase')
    ),
    nn AS (SELECT count(*) AS c FROM chn),
    ut AS (SELECT DISTINCT user_id, event_type FROM events),
    um AS (
      SELECT user_id,
             sum(coalesce((SELECT 1 << bit FROM chn
                           WHERE ch = event_type), 0)) AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
      FROM ut GROUP BY 1
    ),
    sets AS (SELECT mask, count(*) AS nu, sum(conv) AS nc
             FROM um GROUP BY 1),
    allm AS (
      WITH RECURSIVE r(m) AS (
        SELECT CAST(0 AS BIGINT)
        UNION
        SELECT m | (1 << bit) FROM r, chn
      )
      SELECT m FROM r
    ),
    v AS (
      SELECT m, coalesce(nc * 1.0 / nu, 0.0) AS v
      FROM allm LEFT JOIN sets ON sets.mask = allm.m
    ),
    terms AS (
      SELECT chn.ch,
             factorial(CAST(bit_count(v0.m) AS INTEGER))
               * factorial(CAST((SELECT c FROM nn) - 1
                                - bit_count(v0.m) AS INTEGER))
               / factorial(CAST((SELECT c FROM nn) AS INTEGER))
               * (v1.v - v0.v) AS term
      FROM chn
      JOIN v v0 ON (v0.m & (1 << chn.bit)) = 0
      JOIN v v1 ON v1.m = (v0.m | (1 << chn.bit))
    )
    SELECT ch AS channel, round(sum(term), 6) AS shapley
    FROM terms GROUP BY 1
"""


def q_cumulative_users_curve(sf_dir: str):
    """User-growth curve: new users per day (first-ever activity) and the
    running cumulative total — the top-line growth chart.  Per-user first
    day is one keyed MIN; daily new-user counts one combiner exchange;
    the running total rides range_sort + global_prefix_sums (per-block
    cumsum + O(blocks) driver offsets — no single-node window)."""
    from ..stages.agg import grouped_agg
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "day": pc.divide(pc.cast(b.column("ts"), pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
        })

    first = grouped_agg(ev.map_batches(day_of, batch_format="pyarrow"),
                        ["user_id"], [("fd", "day", "min")])
    daily = grouped_agg(first, ["fd"], [("new_users", "fd", "count")],
                        sum_as_float=False)
    s = range_sort(daily, "fd")
    s = global_prefix_sums(s, "new_users", out_name="__cum",
                           exclusive=False)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": b.column("fd"),
            "new_users": pc.cast(b.column("new_users"), pa.int64()),
            "cumulative_users": pc.cast(b.column("__cum"), pa.int64()),
        })

    return s.map_batches(finish, batch_format="pyarrow")


QUERIES["q_cumulative_users_curve"] = q_cumulative_users_curve
ORACLE_SQL["q_cumulative_users_curve"] = """
    WITH f AS (
      SELECT user_id, min(epoch_us(ts) // 86400000000) AS fd
      FROM events GROUP BY 1
    ),
    d AS (SELECT fd AS day, count(*) AS new_users FROM f GROUP BY 1)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
               AS cumulative_users
    FROM d
"""


def q_dn_retention(sf_dir: str):
    """Bounded-window retention (D1 / D7 / D30): share of users whose
    SECOND distinct active day falls within k days of their first — the
    onboarding-quality headline next to the weekly cohort triangle.
    Distinct (user, day) is one combiner; first/second day read off each
    user's sorted run in one co-partition kernel; the 1-row summary folds
    exact integer flags."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "day": pc.divide(pc.cast(b.column("ts"), pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
        })

    ud = grouped_agg(ev.map_batches(day_of, batch_format="pyarrow"),
                     ["user_id", "day"], [("__n", "day", "count")])
    empty = pa.table({"__g": pa.array([], pa.int8()),
                      "r1": pa.array([], pa.int64()),
                      "r7": pa.array([], pa.int64()),
                      "r30": pa.array([], pa.int64()),
                      "u": pa.array([], pa.int64())})

    def flags(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("day", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        d = t.column("day").to_numpy(zero_copy_only=False)
        starts = bounds[:-1]
        sizes = np.diff(bounds)
        fd = d[starts]
        has2 = sizes >= 2
        sd = np.where(has2, d[np.minimum(starts + 1, len(d) - 1)], np.int64(0))
        gap = np.where(has2, sd - fd, np.int64(10 ** 9))
        return pa.table({
            "__g": pa.array(np.zeros(len(starts), np.int8)),
            "r1": pa.array((gap <= 1).astype(np.int64)),
            "r7": pa.array((gap <= 7).astype(np.int64)),
            "r30": pa.array((gap <= 30).astype(np.int64)),
            "u": pa.array(np.ones(len(starts), np.int64)),
        })

    per_user = grouped_map(
        ud, "user_id", flags, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "__n": pa.array([], pa.int64())}))
    g = grouped_agg(per_user, ["__g"],
                    [("n_users", "u", "sum"), ("d1", "r1", "sum"),
                     ("d7", "r7", "sum"), ("d30", "r30", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_users"), pa.float64())
        out = {"n_users": pc.cast(b.column("n_users"), pa.int64())}
        for k in ("d1", "d7", "d30"):
            out[f"retained_{k}"] = pc.cast(b.column(k), pa.int64())
            out[f"rate_{k}"] = round_like_duckdb(
                pc.divide(pc.multiply(pc.cast(b.column(k), pa.float64()),
                                      pa.scalar(1.0, pa.float64())), n), 6)
        return pa.table(out)

    g = g.map_batches(lambda b: b.drop_columns(["__g"]),
                      batch_format="pyarrow")
    return g.map_batches(finish, batch_format="pyarrow")


QUERIES["q_dn_retention"] = q_dn_retention
ORACLE_SQL["q_dn_retention"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    f AS (SELECT user_id, min(day) AS fd FROM ud GROUP BY 1),
    s AS (
      SELECT ud.user_id, min(day) AS sd
      FROM ud JOIN f USING (user_id) WHERE day > fd GROUP BY 1
    ),
    j AS (
      SELECT f.user_id, fd, sd
      FROM f LEFT JOIN s ON f.user_id = s.user_id
    )
    SELECT count(*) AS n_users,
           sum(CASE WHEN sd - fd <= 1 THEN 1 ELSE 0 END) AS retained_d1,
           round(sum(CASE WHEN sd - fd <= 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS rate_d1,
           sum(CASE WHEN sd - fd <= 7 THEN 1 ELSE 0 END) AS retained_d7,
           round(sum(CASE WHEN sd - fd <= 7 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS rate_d7,
           sum(CASE WHEN sd - fd <= 30 THEN 1 ELSE 0 END) AS retained_d30,
           round(sum(CASE WHEN sd - fd <= 30 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS rate_d30
    FROM j
"""


def q_customer_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood entity resolution (the OTHER classic blocking
    strategy next to the SymSpell deletion join): sort names, compare
    each row only to its 5 sorted-order successors, verify edit distance
    ≤ 1 with the vectorized prefix/suffix kernel.  Range sort + global
    row numbers + an overlapped-block co-partition (each row lands in its
    home block and the next; a pair is emitted only where its LATER row
    is home, so nothing duplicates) — candidate count is n·w, never n²."""
    from ..stages.agg import _key_run_bounds, grouped_map
    from ..stages.sim import _ed1_verify_mask
    from ..stages.sort import global_row_numbers, range_sort

    W = 5
    cust = _read(sf_dir, "customer", ["c_name"])
    s = range_sort(cust, "c_name")
    rn = global_row_numbers(s, out_name="rn")

    def explode(b: pa.Table) -> pa.Table:
        r = b.column("rn").to_numpy(zero_copy_only=False)
        names = b.column("c_name").to_numpy(zero_copy_only=False)
        blk = r // W
        return pa.table({
            "block": pa.array(np.concatenate([blk, blk + 1]), pa.int64()),
            "rn": pa.array(np.concatenate([r, r]), pa.int64()),
            "c_name": pa.array(np.concatenate([names, names]), pa.string()),
            "home": pa.array(np.concatenate([
                np.ones(len(r), np.int8), np.zeros(len(r), np.int8)])),
        })

    exploded = rn.map_batches(explode, batch_format="pyarrow")
    empty_pairs = pa.table({"name_a": pa.array([], pa.string()),
                            "name_b": pa.array([], pa.string())})

    def pairs_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_pairs
        t = t.sort_by([("block", "ascending"), ("rn", "ascending")])
        bounds = _key_run_bounds(t, ["block"])
        r = t.column("rn").to_numpy(zero_copy_only=False)
        names = t.column("c_name").to_numpy(zero_copy_only=False)
        home = t.column("home").to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        for bi in range(len(bounds) - 1):
            lo, hi = bounds[bi], bounds[bi + 1]
            rr, nn, hh = r[lo:hi], names[lo:hi], home[lo:hi]
            for d in range(1, W + 1):
                idx = np.searchsorted(rr, rr - d)
                ok = (idx < len(rr))
                ok[ok] = rr[idx[ok]] == rr[ok] - d
                ok &= hh == 1          # later row must be home here
                if ok.any():
                    a_out.append(nn[idx[ok]])
                    b_out.append(nn[ok])
        if not a_out:
            return empty_pairs
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        keep = _ed1_verify_mask(a, b)
        return pa.table({"name_a": pa.array(a[keep], pa.string()),
                         "name_b": pa.array(b[keep], pa.string())})

    return grouped_map(
        exploded, "block", pairs_part, per_group=False,
        empty_schema=pa.table({
            "block": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "home": pa.array([], pa.int8())}))


QUERIES["q_customer_sorted_neighborhood"] = q_customer_sorted_neighborhood
ORACLE_SQL["q_customer_sorted_neighborhood"] = """
    WITH s AS (
      SELECT c_name, row_number() OVER (ORDER BY c_name) AS rn
      FROM customer
    )
    SELECT a.c_name AS name_a, b.c_name AS name_b
    FROM s a JOIN s b ON b.rn > a.rn AND b.rn <= a.rn + 5
    WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q_copurchase_part_triples(sf_dir: str):
    """Market-basket 3-itemsets: part triples shipping in the same order,
    counted across orders, top-20 — the next lattice level above the
    pair kernel (apriori's candidate-of-size-3 stage).  Triples are
    generated inside each order's co-partition run (baskets are ≤ a few
    items, so ≤ C(items,3) per order — never a global self-join); counts
    ride the standard combiner exchange."""
    from ..stages.agg import _key_run_bounds, global_topk, grouped_agg, \
        grouped_map
    from itertools import combinations

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    empty = pa.table({"part_a": pa.array([], pa.int64()),
                      "part_b": pa.array([], pa.int64()),
                      "part_c": pa.array([], pa.int64())})

    def triples_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("l_orderkey", "ascending"),
                       ("l_partkey", "ascending")])
        db = _key_run_bounds(t, ["l_orderkey", "l_partkey"])
        mask = np.zeros(t.num_rows, bool)
        mask[db[:-1]] = True
        t = t.filter(pa.array(mask))  # distinct (order, part)
        bounds = _key_run_bounds(t, ["l_orderkey"])
        sizes = np.diff(bounds)
        parts = t.column("l_partkey").to_numpy(zero_copy_only=False)
        # vectorized across runs: precomputed index triples per basket size
        combo_cache: dict[int, tuple] = {}
        a_out, b_out, c_out = [], [], []
        for ri in np.flatnonzero(sizes >= 3):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            m = e - s
            if m not in combo_cache:
                idx = np.array(list(combinations(range(m), 3)), np.int64)
                combo_cache[m] = (idx[:, 0], idx[:, 1], idx[:, 2])
            ii, jj, kk = combo_cache[m]
            run = parts[s:e]
            a_out.append(run[ii])
            b_out.append(run[jj])
            c_out.append(run[kk])
        if not a_out:
            return empty
        return pa.table({
            "part_a": pa.array(np.concatenate(a_out), pa.int64()),
            "part_b": pa.array(np.concatenate(b_out), pa.int64()),
            "part_c": pa.array(np.concatenate(c_out), pa.int64()),
        })

    triples = grouped_map(
        li, "l_orderkey", triples_part, per_group=False,
        empty_schema=pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "l_partkey": pa.array([], pa.int64())}))
    counts = grouped_agg(triples, ["part_a", "part_b", "part_c"],
                         [("n_orders", "part_a", "count")],
                         sum_as_float=False)
    counts = counts.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_orders"), "n_orders",
            pc.cast(b.column("n_orders"), pa.int64())),
        batch_format="pyarrow")
    return global_topk(counts,
                       ["n_orders", "part_a", "part_b", "part_c"], 20,
                       descending=[True, False, False, False])


QUERIES["q_copurchase_part_triples"] = q_copurchase_part_triples
ORACLE_SQL["q_copurchase_part_triples"] = """
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           c.l_partkey AS part_c, count(*) AS n_orders
    FROM d a
    JOIN d b ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    JOIN d c ON c.l_orderkey = a.l_orderkey AND c.l_partkey > b.l_partkey
    GROUP BY 1, 2, 3
    ORDER BY n_orders DESC, part_a, part_b, part_c LIMIT 20
"""


def q_type_hour_entropy(sf_dir: str):
    """Temporal-concentration score per event type: Shannon entropy of
    the hour-of-day distribution (ln units) and its ratio to the uniform
    maximum ln 24 — bots and batch jobs concentrate, organic traffic
    spreads.  One ≤|types|·24 combiner exchange; the entropy fold runs
    per type on exact integer counts."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb, \
        _key_run_bounds

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def proj(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        hour_of_day = pc.subtract(
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())),
            pc.multiply(pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
                        pa.scalar(24, pa.int64())))
        return pa.table({"event_type": b.column("event_type"),
                         "hour": hour_of_day})

    g = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                    ["event_type", "hour"], [("n", "hour", "count")])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "entropy_nats": pa.array([], pa.float64()),
            "uniformity": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("event_type", "ascending"), ("hour", "ascending")])
        bounds = _key_run_bounds(t, ["event_type"])
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        types, totals, ents = [], [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            tot = float(n[lo:hi].sum())
            p = n[lo:hi] / tot
            h = -float((p * np.log(p)).sum())
            types.append(et[lo])
            totals.append(int(tot))
            ents.append(h)
        ents = np.array(ents)
        out = pa.table({
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(totals, pa.int64()),
            "entropy_nats": pa.array(ents, pa.float64()),
            "uniformity": pa.array(ents / np.log(24.0), pa.float64()),
        })
        for name in ("entropy_nats", "uniformity"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    return grouped_map(g, "event_type", kernel, per_group=False)


QUERIES["q_type_hour_entropy"] = q_type_hour_entropy
ORACLE_SQL["q_type_hour_entropy"] = """
    WITH h AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000
               - (epoch_us(ts) // 86400000000) * 24 AS hour,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(n) AS tot FROM h GROUP BY 1)
    SELECT event_type, CAST(tot AS BIGINT) AS n_events,
           round(-sum((n / tot) * ln(n / tot)), 6) AS entropy_nats,
           round(-sum((n / tot) * ln(n / tot)) / ln(24.0), 6) AS uniformity
    FROM h JOIN t USING (event_type)
    GROUP BY event_type, tot
"""


def q_order_value_hill_tail(sf_dir: str):
    """Hill tail-index estimate of the order-value distribution above its
    p90 threshold: α̂ = n_tail / Σ ln(x/x_min) — the continuous-variable
    companion to the degree power-law MLE (heavy-tail risk of the revenue
    stream).  One exact global quantile (distinct-value combiner + prefix
    sums), then the tail log-sum folds as a mergeable partial; the
    threshold is the ROUND-6 p90 on both sides so membership is
    deterministic."""
    from ..stages.agg import grouped_agg, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    ords = _read(sf_dir, "orders", ["o_totalprice"])
    thr = global_exact_quantiles(ords, "o_totalprice", [("p90", 0.9)],
                                 round_to=6)["p90"]

    def tail(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("o_totalprice"),
                                pa.scalar(thr, pa.float64())))
        lnr = pc.ln(pc.divide(b.column("o_totalprice"),
                              pa.scalar(thr, pa.float64())))
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "lnr": lnr,
        })

    g = grouped_agg(ords.map_batches(tail, batch_format="pyarrow"),
                    ["__g"], [("n_tail", "lnr", "count"),
                              ("s", "lnr", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_tail"), pa.float64())
        alpha = pc.divide(n, b.column("s"))
        return pa.table({
            "threshold_p90": pa.array(
                np.full(b.num_rows, thr), pa.float64()),
            "n_tail": pc.cast(b.column("n_tail"), pa.int64()),
            "hill_alpha": round_like_duckdb(alpha, 6),
        })

    return g.map_batches(finish, batch_format="pyarrow")


QUERIES["q_order_value_hill_tail"] = q_order_value_hill_tail
ORACLE_SQL["q_order_value_hill_tail"] = """
    WITH v AS (SELECT round(quantile_cont(o_totalprice, 0.9), 6) AS thr
               FROM orders),
    t AS (
      SELECT ln(o_totalprice / thr) AS lnr
      FROM orders, v WHERE o_totalprice > thr
    )
    SELECT (SELECT thr FROM v) AS threshold_p90,
           count(*) AS n_tail,
           round(count(*) / sum(lnr), 6) AS hill_alpha
    FROM t
"""


def q_supplier_jaccard_similarity(sf_dir: str):
    """Link prediction / competitor detection on the bipartite supply
    graph: top-20 supplier pairs by Jaccard similarity of their part
    neighborhoods |N(a)∩N(b)| / |N(a)∪N(b)|.  Pairs are generated inside
    each part's co-partition run (bounded by suppliers-per-part — never a
    supplier×supplier join); intersections ride the combiner exchange and
    degrees broadcast back; the ratio is exact integer math."""
    from ..stages.agg import _key_run_bounds, global_topk, grouped_agg, \
        grouped_map, round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    # distinct (part, supplier) edges once
    edges = grouped_agg(li, ["l_partkey", "l_suppkey"],
                        [("__n", "l_partkey", "count")])
    edges = edges.map_batches(
        lambda b: b.select(["l_partkey", "l_suppkey"]),
        batch_format="pyarrow").materialize()

    deg = grouped_agg(edges, ["l_suppkey"], [("deg", "l_suppkey", "count")],
                      sum_as_float=False)
    deg_a = deg.map_batches(
        lambda b: pa.table({"supp_a": b.column("l_suppkey"),
                            "deg_a": pc.cast(b.column("deg"), pa.int64())}),
        batch_format="pyarrow")
    deg_b = deg.map_batches(
        lambda b: pa.table({"supp_b": b.column("l_suppkey"),
                            "deg_b": pc.cast(b.column("deg"), pa.int64())}),
        batch_format="pyarrow")

    empty = pa.table({"supp_a": pa.array([], pa.int64()),
                      "supp_b": pa.array([], pa.int64())})

    def pairs_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("l_partkey", "ascending"),
                       ("l_suppkey", "ascending")])
        bounds = _key_run_bounds(t, ["l_partkey"])
        sizes = np.diff(bounds)
        supps = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        a_out, b_out = [], []
        for ri in np.flatnonzero(sizes >= 2):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            ii, jj = np.triu_indices(e - s, k=1)
            a_out.append(supps[s:e][ii])
            b_out.append(supps[s:e][jj])
        if not a_out:
            return empty
        return pa.table({
            "supp_a": pa.array(np.concatenate(a_out), pa.int64()),
            "supp_b": pa.array(np.concatenate(b_out), pa.int64()),
        })

    pairs = grouped_map(
        edges, "l_partkey", pairs_part, per_group=False,
        empty_schema=pa.table({
            "l_partkey": pa.array([], pa.int64()),
            "l_suppkey": pa.array([], pa.int64())}))
    inter = grouped_agg(pairs, ["supp_a", "supp_b"],
                        [("n_shared", "supp_a", "count")],
                        sum_as_float=False)
    # degrees ride in plasma via the standard broadcast join (vectorized,
    # never a per-row Python dict probe)
    j = broadcast_join(inter, deg_a, left_key="supp_a",
                       right_key="supp_a", columns=["deg_a"])
    j = broadcast_join(j, deg_b, left_key="supp_b",
                       right_key="supp_b", columns=["deg_b"])

    def score(b: pa.Table) -> pa.Table:
        if "n_shared" not in b.column_names:
            return pa.table({"supp_a": pa.array([], pa.int64()),
                             "supp_b": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        inter_n = pc.cast(b.column("n_shared"), pa.int64())
        union = pc.subtract(pc.add(b.column("deg_a"), b.column("deg_b")),
                            inter_n)
        jac = pc.divide(pc.multiply(pc.cast(inter_n, pa.float64()),
                                    pa.scalar(1.0, pa.float64())),
                        pc.cast(union, pa.float64()))
        return pa.table({
            "supp_a": b.column("supp_a"),
            "supp_b": b.column("supp_b"),
            "n_shared": inter_n,
            "jaccard": round_like_duckdb(jac, 6),
        })

    scored = j.map_batches(score, batch_format="pyarrow")
    return global_topk(scored, ["jaccard", "supp_a", "supp_b"], 20,
                       descending=[True, False, False])


QUERIES["q_supplier_jaccard_similarity"] = q_supplier_jaccard_similarity
ORACLE_SQL["q_supplier_jaccard_similarity"] = """
    WITH e AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    d AS (SELECT l_suppkey, count(*) AS deg FROM e GROUP BY 1),
    i AS (
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
             count(*) AS n_shared
      FROM e a JOIN e b
        ON a.l_partkey = b.l_partkey AND b.l_suppkey > a.l_suppkey
      GROUP BY 1, 2
    )
    SELECT supp_a, supp_b, n_shared,
           round(n_shared * 1.0 / (da.deg + db.deg - n_shared), 6)
               AS jaccard
    FROM i JOIN d da ON da.l_suppkey = supp_a
           JOIN d db ON db.l_suppkey = supp_b
    ORDER BY jaccard DESC, supp_a, supp_b LIMIT 20
"""


def q_user_rate_limit_screen(sf_dir: str):
    """Anti-abuse rate screen: each user's PEAK sliding-1-hour event
    count (window anchored at every event), top-20 burstiest users — the
    rate-limiter's offline calibration query.  Inside each user's
    time-sorted run one vectorized searchsorted gives every anchor's
    window population; no self-join, no per-row loop."""
    from ..stages.agg import _key_run_bounds, global_topk, grouped_map

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "peak_1h": pa.array([], pa.int64())})

    def peak_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        out_u, out_p = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            run = us[lo:hi]
            cnt = np.searchsorted(run, run + 3_600_000_000,
                                  side="right") - np.arange(hi - lo)
            out_u.append(uid[lo])
            out_p.append(int(cnt.max()))
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "peak_1h": pa.array(out_p, pa.int64())})

    peaks = grouped_map(
        ev, "user_id", peak_part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64())}))
    return global_topk(peaks, ["peak_1h", "user_id"], 20,
                       descending=[True, False])


QUERIES["q_user_rate_limit_screen"] = q_user_rate_limit_screen
ORACLE_SQL["q_user_rate_limit_screen"] = """
    WITH w AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN CURRENT ROW AND 3600000000 FOLLOWING
             ) AS cnt
      FROM events
    )
    SELECT user_id, max(cnt) AS peak_1h
    FROM w GROUP BY 1
    ORDER BY peak_1h DESC, user_id LIMIT 20
"""


def q_user_active_days_histogram(sf_dir: str):
    """Engagement-depth histogram: how many users were active on exactly
    k distinct days — the L28-style depth distribution behind DAU/MAU.
    Two chained combiner exchanges (distinct (user, day) → per-user day
    count → per-count user count); exact integers end to end."""
    from ..stages.agg import grouped_agg

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "day": pc.divide(pc.cast(b.column("ts"), pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
        })

    ud = grouped_agg(ev.map_batches(day_of, batch_format="pyarrow"),
                     ["user_id", "day"], [("__n", "day", "count")])
    per_user = grouped_agg(ud, ["user_id"],
                           [("active_days", "day", "count")],
                           sum_as_float=False)
    hist = grouped_agg(per_user, ["active_days"],
                       [("n_users", "active_days", "count")],
                       sum_as_float=False)
    return hist.map_batches(
        lambda b: pa.table({
            "active_days": pc.cast(b.column("active_days"), pa.int64()),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
        }), batch_format="pyarrow")


QUERIES["q_user_active_days_histogram"] = q_user_active_days_histogram
ORACLE_SQL["q_user_active_days_histogram"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    u AS (SELECT user_id, count(*) AS active_days FROM ud GROUP BY 1)
    SELECT active_days, count(*) AS n_users
    FROM u GROUP BY 1
"""


def q_part_price_dispersion(sf_dir: str):
    """Law-of-one-price screen: the 20 parts whose realized unit price
    disperses most (coefficient of variation), among parts sold in ≥ 5
    line items — pricing-anomaly detection.  Unit prices derive map-side;
    per-part std/mean come from one mergeable moment exchange; the CV
    ranking is deterministic (round-6 CV, partkey tiebreak)."""
    from ..stages.agg import global_topk, grouped_agg, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_quantity"])

    def unit(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b.column("l_partkey"),
            "up": pc.divide(b.column("l_extendedprice"),
                            b.column("l_quantity")),
        })

    g = grouped_agg(li.map_batches(unit, batch_format="pyarrow"),
                    ["l_partkey"],
                    [("n_items", "up", "count"), ("m", "up", "mean"),
                     ("sd", "up", "std")])

    def score(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b.column("n_items"),
                                      pa.scalar(5, pa.int64())))
        cv = pc.divide(b.column("sd"), b.column("m"))
        return pa.table({
            "l_partkey": b.column("l_partkey"),
            "n_items": pc.cast(b.column("n_items"), pa.int64()),
            "mean_unit_price": round_like_duckdb(b.column("m"), 6),
            "cv_unit_price": round_like_duckdb(cv, 6),
        })

    scored = g.map_batches(score, batch_format="pyarrow")
    return global_topk(scored, ["cv_unit_price", "l_partkey"], 20,
                       descending=[True, False])


QUERIES["q_part_price_dispersion"] = q_part_price_dispersion
ORACLE_SQL["q_part_price_dispersion"] = """
    WITH g AS (
      SELECT l_partkey, count(*) AS n_items,
             avg(l_extendedprice / l_quantity) AS m,
             stddev_samp(l_extendedprice / l_quantity) AS sd
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, n_items, round(m, 6) AS mean_unit_price,
           round(sd / m, 6) AS cv_unit_price
    FROM g WHERE n_items >= 5
    ORDER BY round(sd / m, 6) DESC, l_partkey LIMIT 20
"""


def q_type_temporal_cosine(sf_dir: str):
    """Temporal-fingerprint similarity: cosine between event types'
    168-bin (dow × hour) activity profiles — do two event streams share
    a schedule (bot pairs, pipeline stages) or live on different clocks?
    One ≤|types|·168 combiner; the pairwise cosine folds over the tiny
    profile table on exact integer counts."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def proj(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64())))
        hour = pc.subtract(
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())),
            pc.multiply(day, pa.scalar(24, pa.int64())))
        cell = pc.add(pc.multiply(dow, pa.scalar(24, pa.int64())), hour)
        return pa.table({"event_type": b.column("event_type"),
                         "cell": cell})

    g = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                    ["event_type", "cell"], [("n", "cell", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "cosine": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        types, ti = np.unique(et, return_inverse=True)
        prof = np.zeros((len(types), 168))
        prof[ti, cell] = n
        a_out, b_out, c_out = [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                num = float((prof[i] * prof[j]).sum())
                den = np.sqrt(float((prof[i] * prof[i]).sum())
                              * float((prof[j] * prof[j]).sum()))
                a_out.append(types[i])
                b_out.append(types[j])
                c_out.append(num / den if den > 0.0 else None)
        out = pa.table({"type_a": pa.array(a_out, pa.string()),
                        "type_b": pa.array(b_out, pa.string()),
                        "cosine": pa.array(c_out, pa.float64())})
        idx = out.column_names.index("cosine")
        return out.set_column(idx, "cosine",
                              round_like_duckdb(out.column("cosine"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["type_a", "type_b", "cosine"]),
        batch_format="pyarrow")


QUERIES["q_type_temporal_cosine"] = q_type_temporal_cosine
ORACLE_SQL["q_type_temporal_cosine"] = """
    WITH c AS (
      SELECT event_type,
             ((epoch_us(ts) // 86400000000 + 3) % 7) * 24
               + (epoch_us(ts) // 3600000000
                  - (epoch_us(ts) // 86400000000) * 24) AS cell,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             sum(CAST(a.n AS DOUBLE) * b.n) AS num
      FROM c a JOIN c b
        ON a.cell = b.cell AND b.event_type > a.event_type
      GROUP BY 1, 2
    ),
    s AS (SELECT event_type, sum(CAST(n AS DOUBLE) * n) AS ss
          FROM c GROUP BY 1)
    SELECT type_a, type_b,
           round(num / sqrt(sa.ss * sb.ss), 6) AS cosine
    FROM p JOIN s sa ON sa.event_type = type_a
           JOIN s sb ON sb.event_type = type_b
"""


def q_weekend_value_qq(sf_dir: str):
    """QQ table weekday vs weekend event values: the nine deciles of each
    side, side by side with their gap — the distribution-shift visual
    behind the Mann-Whitney test (same shared temporal-split preamble).
    Exact grouped quantiles (quantile_cont semantics) per side; the pivot
    happens on an 18-row table."""
    from ..stages.agg import grouped_map, grouped_quantiles, \
        round_like_duckdb

    labeled = _weekend_labeled_events(sf_dir)
    qs = [(f"q{i}", i / 10.0) for i in range(1, 10)]
    per_side = grouped_quantiles(labeled, "variant", "value", qs,
                                 round_to=6)

    def pivot(t: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "weekday_value": pa.array([], pa.float64()),
                          "weekend_value": pa.array([], pa.float64()),
                          "gap": pa.array([], pa.float64())})
        rows = {r["variant"]: r for r in t.to_pylist()}
        if "weekday" not in rows or "weekend" not in rows:
            return empty
        wd, we = rows["weekday"], rows["weekend"]
        dec, wdv, wev, gap = [], [], [], []
        for i in range(1, 10):
            dec.append(i)
            wdv.append(wd[f"q{i}"])
            wev.append(we[f"q{i}"])
            gap.append(we[f"q{i}"] - wd[f"q{i}"])
        out = pa.table({"decile": pa.array(dec, pa.int64()),
                        "weekday_value": pa.array(wdv, pa.float64()),
                        "weekend_value": pa.array(wev, pa.float64()),
                        "gap": pa.array(gap, pa.float64())})
        idx = out.column_names.index("gap")
        return out.set_column(idx, "gap",
                              round_like_duckdb(out.column("gap"), 6))

    out = grouped_map(per_side.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", pivot, per_group=False)
    return out.map_batches(
        lambda b: b.select(["decile", "weekday_value", "weekend_value",
                            "gap"]),
        batch_format="pyarrow")


QUERIES["q_weekend_value_qq"] = q_weekend_value_qq
ORACLE_SQL["q_weekend_value_qq"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 'weekend' ELSE 'weekday' END AS variant,
             value
      FROM events
    ),
    q AS (
      SELECT variant,
             unnest(range(1, 10)) AS decile,
             unnest([round(quantile_cont(value, 0.1), 6),
                     round(quantile_cont(value, 0.2), 6),
                     round(quantile_cont(value, 0.3), 6),
                     round(quantile_cont(value, 0.4), 6),
                     round(quantile_cont(value, 0.5), 6),
                     round(quantile_cont(value, 0.6), 6),
                     round(quantile_cont(value, 0.7), 6),
                     round(quantile_cont(value, 0.8), 6),
                     round(quantile_cont(value, 0.9), 6)]) AS v
      FROM s GROUP BY variant
    )
    SELECT wd.decile AS decile, wd.v AS weekday_value,
           we.v AS weekend_value, round(we.v - wd.v, 6) AS gap
    FROM q wd JOIN q we USING (decile)
    WHERE wd.variant = 'weekday' AND we.variant = 'weekend'
"""


def q_daily_revenue_dow_anova(sf_dir: str):
    """Weekday-seasonality strength: one-way ANOVA of daily revenue
    across day-of-week — η² is the share of daily-revenue variance the
    weekly cycle explains (the STL-lite seasonality-strength score), F
    its significance.  The shared exact-cents daily table + the
    oneway_anova primitive; zero new shuffle shapes."""
    from ..stages.agg import oneway_anova

    daily = _daily_order_revenue_cents(sf_dir)

    def label(b: pa.Table) -> pa.Table:
        d3 = pc.add(b.column("day"), pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        return pa.table({
            "dow": dow,
            "rev": pc.divide(pc.cast(b.column("c"), pa.float64()),
                             pa.scalar(100.0, pa.float64())),
        })

    return oneway_anova(daily.map_batches(label, batch_format="pyarrow"),
                        "dow", "rev")


QUERIES["q_daily_revenue_dow_anova"] = q_daily_revenue_dow_anova
ORACLE_SQL["q_daily_revenue_dow_anova"] = """
    WITH d AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM orders GROUP BY 1
    ),
    z AS (SELECT (day + 3) % 7 + 1 AS dow, rev FROM d),
    g AS (
      SELECT dow, count(*) AS n, avg(rev) AS m, var_samp(rev) AS v
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(n) AS nt, sum(n * m) / sum(n) AS gm
      FROM g
    ),
    ss AS (
      SELECT (SELECT sum(n * ((m - gm) * (m - gm))) FROM g, tot) AS ssb,
             (SELECT sum((n - 1.0) * v) FROM g WHERE n > 1) AS ssw
    )
    SELECT (SELECT k FROM tot) AS k_groups,
           CAST((SELECT nt FROM tot) AS BIGINT) AS n_total,
           round(CASE WHEN ssw > 0 THEN (ssb / ((SELECT k FROM tot) - 1.0))
                 / (ssw / ((SELECT nt FROM tot) - (SELECT k FROM tot)))
                 END, 6) AS f_stat,
           round(CASE WHEN ssb + ssw > 0 THEN ssb / (ssb + ssw) END, 6)
               AS eta_sq
    FROM ss
"""


def q_click_period_kappa(sf_dir: str):
    """Cohen's kappa between the two halves of the window on per-user
    click behavior — chance-corrected agreement (the stability companion
    to McNemar's asymmetry test, same shared paired-flag preamble):
    κ = (p_o − p_e)/(1 − p_e) from the exact 2×2 integer cells."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    u = _click_period_flags(sf_dir)

    def cell(b: pa.Table) -> pa.Table:
        one = pa.scalar(1, pa.int64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "n11": pc.multiply(b.column("f1"), b.column("f2")),
            "n10": pc.multiply(b.column("f1"),
                               pc.subtract(one, b.column("f2"))),
            "n01": pc.multiply(pc.subtract(one, b.column("f1")),
                               b.column("f2")),
        })

    g = grouped_agg(u.map_batches(cell, batch_format="pyarrow"), ["__g"],
                    [("n_users", "n11", "count"), ("n11", "n11", "sum"),
                     ("n10", "n10", "sum"), ("n01", "n01", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_users": pa.array([], pa.int64()),
            "observed_agreement": pa.array([], pa.float64()),
            "expected_agreement": pa.array([], pa.float64()),
            "kappa": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        n = float(r["n_users"])
        n11, n10, n01 = float(r["n11"]), float(r["n10"]), float(r["n01"])
        n00 = n - n11 - n10 - n01
        po = (n11 + n00) / n
        p1a, p1b = (n11 + n10) / n, (n11 + n01) / n
        pe = p1a * p1b + (1.0 - p1a) * (1.0 - p1b)
        kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else None
        out = pa.table({
            "n_users": pa.array([int(n)], pa.int64()),
            "observed_agreement": pa.array([po], pa.float64()),
            "expected_agreement": pa.array([pe], pa.float64()),
            "kappa": pa.array([kappa], pa.float64()),
        })
        for name in ("observed_agreement", "expected_agreement", "kappa"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_users", "observed_agreement",
                            "expected_agreement", "kappa"]),
        batch_format="pyarrow")


QUERIES["q_click_period_kappa"] = q_click_period_kappa
ORACLE_SQL["q_click_period_kappa"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
    bnd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
    u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click'
                       AND us < (SELECT mid FROM bnd)
                      THEN 1 ELSE 0 END) AS f1,
             max(CASE WHEN event_type = 'click'
                       AND us >= (SELECT mid FROM bnd)
                      THEN 1 ELSE 0 END) AS f2
      FROM e GROUP BY 1
    ),
    g AS (
      SELECT count(*) * 1.0 AS n,
             sum(f1 * f2) * 1.0 AS n11,
             sum(f1 * (1 - f2)) * 1.0 AS n10,
             sum((1 - f1) * f2) * 1.0 AS n01
      FROM u
    ),
    p AS (
      SELECT n, (n11 + (n - n11 - n10 - n01)) / n AS po,
             ((n11 + n10) / n) * ((n11 + n01) / n)
               + (1.0 - (n11 + n10) / n) * (1.0 - (n11 + n01) / n) AS pe
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(po, 6) AS observed_agreement,
           round(pe, 6) AS expected_agreement,
           round((po - pe) / (1.0 - pe), 6) AS kappa
    FROM p
"""


def q_weekend_purchase_odds(sf_dir: str):
    """Odds ratio of purchasing on a weekend vs weekday event (the 2×2
    epidemiology read): OR = (a·d)/(b·c) with the Woolf log-OR 95 % CI
    exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) — exact integer cells from one
    map-side projection + a 4-cell combiner."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def proj(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        wkd = pc.greater_equal(dow, pa.scalar(6, pa.int64()))
        pur = pc.equal(b.column("event_type"), pa.scalar("purchase"))
        one = pa.scalar(1, pa.int64())
        a = pc.cast(pc.and_(wkd, pur), pa.int64())
        bb = pc.cast(pc.and_(wkd, pc.invert(pur)), pa.int64())
        c = pc.cast(pc.and_(pc.invert(wkd), pur), pa.int64())
        d = pc.cast(pc.and_(pc.invert(wkd), pc.invert(pur)), pa.int64())
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "a": a, "b": bb, "c": c, "d": d})

    g = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"), ["__g"],
                    [("a", "a", "sum"), ("b", "b", "sum"),
                     ("c", "c", "sum"), ("d", "d", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_weekend_purchase": pa.array([], pa.int64()),
            "n_weekend_other": pa.array([], pa.int64()),
            "n_weekday_purchase": pa.array([], pa.int64()),
            "n_weekday_other": pa.array([], pa.int64()),
            "odds_ratio": pa.array([], pa.float64()),
            "ci_low": pa.array([], pa.float64()),
            "ci_high": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        a, b, c, d = (float(r["a"]), float(r["b"]),
                      float(r["c"]), float(r["d"]))
        if min(a, b, c, d) <= 0.0:
            orat = lo = hi = None
        else:
            orat = (a * d) / (b * c)
            se = np.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
            lo = float(np.exp(np.log(orat) - 1.96 * se))
            hi = float(np.exp(np.log(orat) + 1.96 * se))
        out = pa.table({
            "n_weekend_purchase": pa.array([int(a)], pa.int64()),
            "n_weekend_other": pa.array([int(b)], pa.int64()),
            "n_weekday_purchase": pa.array([int(c)], pa.int64()),
            "n_weekday_other": pa.array([int(d)], pa.int64()),
            "odds_ratio": pa.array([orat], pa.float64()),
            "ci_low": pa.array([lo], pa.float64()),
            "ci_high": pa.array([hi], pa.float64()),
        })
        for name in ("odds_ratio", "ci_low", "ci_high"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_weekend_purchase", "n_weekend_other",
                            "n_weekday_purchase", "n_weekday_other",
                            "odds_ratio", "ci_low", "ci_high"]),
        batch_format="pyarrow")


QUERIES["q_weekend_purchase_odds"] = q_weekend_purchase_odds
ORACLE_SQL["q_weekend_purchase_odds"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1 ELSE 0 END AS wkd,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur
      FROM events
    ),
    g AS (
      SELECT sum(wkd * pur) * 1.0 AS a,
             sum(wkd * (1 - pur)) * 1.0 AS b,
             sum((1 - wkd) * pur) * 1.0 AS c,
             sum((1 - wkd) * (1 - pur)) * 1.0 AS d
      FROM s
    )
    SELECT CAST(a AS BIGINT) AS n_weekend_purchase,
           CAST(b AS BIGINT) AS n_weekend_other,
           CAST(c AS BIGINT) AS n_weekday_purchase,
           CAST(d AS BIGINT) AS n_weekday_other,
           round((a * d) / (b * c), 6) AS odds_ratio,
           round(exp(ln((a * d) / (b * c))
                     - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
               AS ci_low,
           round(exp(ln((a * d) / (b * c))
                     + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
               AS ci_high
    FROM g
"""


def q_user_count_overdispersion(sf_dir: str):
    """Overdispersion check on per-user event counts: the index of
    dispersion D = var/mean (Poisson ⇒ 1) and its chi-square form
    (n−1)·D — the screen that says "user activity is NOT Poisson, use a
    negative-binomial model".  Per-user counts are one combiner; the
    moments one more; exact integer counts feed the ratio."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id"])
    counts = grouped_agg(ev, ["user_id"], [("n", "user_id", "count")])

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int8)),
            "n": pc.cast(b.column("n"), pa.float64()),
        })

    g = grouped_agg(counts.map_batches(tag, batch_format="pyarrow"),
                    ["__g"], [("k", "n", "count"), ("m", "n", "mean"),
                              ("v", "n", "var")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_users": pa.array([], pa.int64()),
            "mean_events": pa.array([], pa.float64()),
            "var_events": pa.array([], pa.float64()),
            "dispersion_index": pa.array([], pa.float64()),
            "chi2_dispersion": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        k, m, v = float(r["k"]), r["m"], r["v"]
        if m is None or v is None or m == 0.0:
            return empty
        d = v / m
        out = pa.table({
            "n_users": pa.array([int(k)], pa.int64()),
            "mean_events": pa.array([m], pa.float64()),
            "var_events": pa.array([v], pa.float64()),
            "dispersion_index": pa.array([d], pa.float64()),
            "chi2_dispersion": pa.array([(k - 1.0) * d], pa.float64()),
        })
        for name in ("mean_events", "var_events", "dispersion_index",
                     "chi2_dispersion"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_users", "mean_events", "var_events",
                            "dispersion_index", "chi2_dispersion"]),
        batch_format="pyarrow")


QUERIES["q_user_count_overdispersion"] = q_user_count_overdispersion
ORACLE_SQL["q_user_count_overdispersion"] = """
    WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    g AS (SELECT count(*) AS k, avg(n * 1.0) AS m, var_samp(n * 1.0) AS v
          FROM u)
    SELECT k AS n_users, round(m, 6) AS mean_events,
           round(v, 6) AS var_events,
           round(v / m, 6) AS dispersion_index,
           round((k - 1.0) * (v / m), 6) AS chi2_dispersion
    FROM g
"""


def q_weekly_value_envelope(sf_dir: str):
    """Monitoring envelope: weekly p10 / p50 / p90 of event value — the
    control-band table dashboards draw around a metric.  Exact grouped
    quantiles (quantile_cont semantics) keyed by epoch week; one keyed
    exchange co-locates each week's values."""
    from ..stages.agg import grouped_quantiles

    ev = _read(sf_dir, "events", ["ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"week": _epoch_week(b.column("ts")),
                         "value": b.column("value")})

    return grouped_quantiles(
        ev.map_batches(proj, batch_format="pyarrow"), "week", "value",
        [("p10", 0.1), ("p50", 0.5), ("p90", 0.9)], round_to=6)


QUERIES["q_weekly_value_envelope"] = q_weekly_value_envelope
ORACLE_SQL["q_weekly_value_envelope"] = """
    SELECT epoch_us(ts) // 604800000000 AS week,
           round(quantile_cont(value, 0.1), 6) AS p10,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY 1
"""


def q_daily_revenue_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test for randomness of the daily revenue
    series around its median: too FEW runs of above/below-median days
    means streaky (trending/autocorrelated) revenue, too many means
    oscillation.  The shared exact-cents daily table + one exact global
    median; runs count and the normal approximation finalize over the
    tiny series (median-equal days drop, per the classic test)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_above": pa.array([], pa.int64()),
            "n_below": pa.array([], pa.int64()),
            "n_runs": pa.array([], pa.int64()),
            "z_runs": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        cs = np.sort(c)
        h = (len(cs) - 1) * 0.5
        lo = int(np.floor(h))
        med = (cs[lo] if h == lo
               else cs[lo] + (cs[lo + 1] - cs[lo]) * (h - lo))
        sign = c[c != med] > med            # median-equal days drop
        if len(sign) < 2:
            return empty
        n1 = float(sign.sum())
        n2 = float(len(sign) - n1)
        runs = int(1 + (sign[1:] != sign[:-1]).sum())
        n = n1 + n2
        if n1 == 0.0 or n2 == 0.0:
            z = None
        else:
            mu = 2.0 * n1 * n2 / n + 1.0
            var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                   / (n * n * (n - 1.0)))
            z = (runs - mu) / np.sqrt(var) if var > 0.0 else None
        out = pa.table({
            "n_above": pa.array([int(n1)], pa.int64()),
            "n_below": pa.array([int(n2)], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "z_runs": pa.array([z], pa.float64()),
        })
        idx = out.column_names.index("z_runs")
        return out.set_column(idx, "z_runs",
                              round_like_duckdb(out.column("z_runs"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_above", "n_below", "n_runs", "z_runs"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_runs_test"] = q_daily_revenue_runs_test
ORACLE_SQL["q_daily_revenue_runs_test"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                  AS DOUBLE) AS c
      FROM orders GROUP BY 1
    ),
    m AS (SELECT quantile_cont(c, 0.5) AS med FROM d),
    s AS (
      SELECT day, CASE WHEN c > med THEN 1 ELSE 0 END AS sgn
      FROM d, m WHERE c <> med
    ),
    r AS (
      SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev FROM s
    ),
    g AS (
      SELECT sum(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END)
               AS runs,
             sum(sgn) * 1.0 AS n1,
             sum(1 - sgn) * 1.0 AS n2
      FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
           CAST(runs AS BIGINT) AS n_runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                        / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1.0))), 6)
               AS z_runs
    FROM g
"""


def q_vocab_heaps_exponent(sf_dir: str):
    """Heaps'-law fit on the vocabulary growth curve: V = K·N^β via a
    log-log regression of cumulative vocabulary on cumulative token
    count per ingest batch — "how fast does more data stop adding new
    vocabulary".  The flat (batch, token) stream is materialized once
    and feeds BOTH the per-batch totals and the first-seen min-combiner;
    the tiny curve finalizes with the same moment formula as
    regr_slope."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.joins import hash_join
    from ..stages.sort import global_prefix_sums, range_sort

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def flat(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        batch = (b.column("doc_id").to_numpy(zero_copy_only=False)
                 // 100).astype(np.int64)
        return pa.table({
            "batch": pa.array(np.repeat(batch, lens), pa.int64()),
            "token": pc.list_flatten(toks),
        })

    t = docs.map_batches(flat, batch_format="pyarrow").materialize()
    tot = grouped_agg(t, ["batch"], [("toks", "batch", "count")],
                      sum_as_float=False)
    first = grouped_agg(t, ["token"], [("batch", "batch", "min")])
    news = grouped_agg(first, ["batch"], [("new_tokens", "batch", "count")],
                       sum_as_float=False)
    j = hash_join(tot, news, left_key="batch", right_key="batch",
                  how="left outer")

    def clean(b: pa.Table) -> pa.Table:
        if "toks" not in b.column_names:
            return pa.table({"batch": pa.array([], pa.int64()),
                             "toks": pa.array([], pa.int64()),
                             "new_tokens": pa.array([], pa.int64())})
        return pa.table({
            "batch": b.column("batch"),
            "toks": pc.cast(b.column("toks"), pa.int64()),
            "new_tokens": pc.cast(pc.coalesce(
                b.column("new_tokens"), pa.scalar(0, pa.int64())),
                pa.int64()),
        })

    s = range_sort(j.map_batches(clean, batch_format="pyarrow"), "batch")
    s = global_prefix_sums(s, "toks", out_name="__cn", exclusive=False)
    s = global_prefix_sums(s, "new_tokens", out_name="__cv",
                           exclusive=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_points": pa.array([], pa.int64()),
            "heaps_beta": pa.array([], pa.float64()),
            "heaps_k": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("batch", "ascending")])
        x = np.log(t.column("__cn").to_numpy(zero_copy_only=False) * 1.0)
        y = np.log(t.column("__cv").to_numpy(zero_copy_only=False) * 1.0)
        n = float(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        dx = n * sxx - sx * sx
        if dx <= 0.0:
            return empty
        slope = (n * sxy - sx * sy) / dx
        intercept = (sy - slope * sx) / n
        out = pa.table({
            "n_points": pa.array([int(n)], pa.int64()),
            "heaps_beta": pa.array([slope], pa.float64()),
            "heaps_k": pa.array([float(np.exp(intercept))], pa.float64()),
        })
        for name in ("heaps_beta", "heaps_k"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(s.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_points", "heaps_beta", "heaps_k"]),
        batch_format="pyarrow")


QUERIES["q_vocab_heaps_exponent"] = q_vocab_heaps_exponent
ORACLE_SQL["q_vocab_heaps_exponent"] = """
    WITH t AS (
      SELECT doc_id // 100 AS batch,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tot AS (SELECT batch, count(*) AS toks FROM t GROUP BY 1),
    f AS (SELECT token, min(batch) AS batch FROM t GROUP BY 1),
    n AS (SELECT batch, count(*) AS new_tokens FROM f GROUP BY 1),
    c AS (
      SELECT tot.batch,
             sum(toks) OVER (ORDER BY tot.batch) AS cn,
             sum(coalesce(new_tokens, 0)) OVER (ORDER BY tot.batch) AS cv
      FROM tot LEFT JOIN n ON n.batch = tot.batch
    )
    SELECT count(*) AS n_points,
           round(regr_slope(ln(cv * 1.0), ln(cn * 1.0)), 6) AS heaps_beta,
           round(exp(regr_intercept(ln(cv * 1.0), ln(cn * 1.0))), 6)
               AS heaps_k
    FROM c
"""


def q_daily_revenue_arch(sf_dir: str):
    """ARCH-effect screen (volatility clustering): Pearson correlation of
    consecutive |log-return| magnitudes of daily revenue — do turbulent
    days follow turbulent days?  The shared exact-cents daily table; the
    lag-1 pairing and the moment correlation finalize over the tiny
    series with the regr/corr op tree."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_pairs": pa.array([], pa.int64()),
            "arch_corr": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False)
        a = np.abs(np.log(c[1:] / c[:-1]))
        x, y = a[:-1], a[1:]
        n = float(len(x))
        sx, sy = x.sum(), y.sum()
        num = n * (x * y).sum() - sx * sy
        dx = n * (x * x).sum() - sx * sx
        dy = n * (y * y).sum() - sy * sy
        corr = num / np.sqrt(dx * dy) if dx > 0.0 and dy > 0.0 else None
        out = pa.table({
            "n_pairs": pa.array([int(n)], pa.int64()),
            "arch_corr": pa.array([corr], pa.float64()),
        })
        idx = out.column_names.index("arch_corr")
        return out.set_column(
            idx, "arch_corr",
            round_like_duckdb(out.column("arch_corr"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_pairs", "arch_corr"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_arch"] = q_daily_revenue_arch
ORACLE_SQL["q_daily_revenue_arch"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT day, abs(ln(c / lag(c) OVER (ORDER BY day))) AS a
      FROM d
    ),
    p AS (
      SELECT a AS y, lag(a) OVER (ORDER BY day) AS x
      FROM r WHERE a IS NOT NULL
    )
    SELECT count(*) AS n_pairs, round(corr(y, x), 6) AS arch_corr
    FROM p WHERE x IS NOT NULL
"""


def q_doc_self_repetition(sf_dir: str):
    """Boilerplate screen: per language, the average of each document's
    MAX internal trigram repeat count and the share of docs that repeat
    any trigram — templated/spun text repeats itself, organic text
    doesn't.  Fully vectorized per batch: one flat split, dictionary
    codes, a doc-boundary-masked triple shift, one lexsort run-length
    pass for the per-doc max; per-lang means ride the combiner.  Docs
    under 3 tokens drop (no trigram), matching the oracle."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    docs = _read(sf_dir, "documents", ["text", "lang"])

    def rep(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "mx": pa.array([], pa.int64())})
        toks = pc.split_pattern(b.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        m = len(flat)
        if m < 3:
            return empty
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        # trigram start positions: within-doc offset < len-2
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos_in_doc = np.arange(m) - offs[doc_idx]
        start = pos_in_doc < lens[doc_idx] - 2
        si = np.flatnonzero(start)
        si = si[si + 2 < m]
        d = doc_idx[si]
        g1, g2, g3 = codes[si], codes[si + 1], codes[si + 2]
        order = np.lexsort((g3, g2, g1, d))
        dd, a1, a2, a3 = d[order], g1[order], g2[order], g3[order]
        new = np.ones(len(dd), bool)
        new[1:] = ((dd[1:] != dd[:-1]) | (a1[1:] != a1[:-1])
                   | (a2[1:] != a2[:-1]) | (a3[1:] != a3[:-1]))
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        run_doc = dd[new]
        mx = np.zeros(len(lens), np.int64)
        np.maximum.at(mx, run_doc, run_len)
        keep = lens >= 3
        langs = b.column("lang").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "mx": pa.array(mx[keep], pa.int64())})

    scored = docs.map_batches(rep, batch_format="pyarrow")

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b.column("lang"),
            "mx": pc.cast(b.column("mx"), pa.float64()),
            "rep": pc.cast(pc.greater_equal(b.column("mx"),
                                            pa.scalar(2, pa.int64())),
                           pa.int64()),
        })

    return grouped_agg(scored.map_batches(flags, batch_format="pyarrow"),
                       ["lang"],
                       [("n_docs", "mx", "count"),
                        ("avg_max_repeat", "mx", "mean"),
                        ("n_repetitive", "rep", "sum")],
                       round_to=6)


QUERIES["q_doc_self_repetition"] = q_doc_self_repetition
ORACLE_SQL["q_doc_self_repetition"] = """
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS tri
      FROM t
    ),
    c AS (SELECT doc_id, lang, tri, count(*) AS n FROM g GROUP BY 1, 2, 3),
    m AS (SELECT doc_id, lang, max(n) AS mx FROM c GROUP BY 1, 2)
    SELECT lang, count(*) AS n_docs,
           round(avg(mx * 1.0), 6) AS avg_max_repeat,
           CAST(sum(CASE WHEN mx >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive
    FROM m GROUP BY 1
"""


def q_embedding_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for each of the 50
    held-out query vectors, the single most-similar corpus vector with a
    DIFFERENT label — the negatives that actually teach a metric model.
    One matmul pass per block against the broadcast query matrix with the
    same-label columns masked out; per-query top-1 merges through
    grouped_topk.  Round-4 sims + id tiebreak make the pick
    deterministic."""
    import ray

    from ..stages.agg import grouped_topk
    from ..stages.ann import _normalize, _stack

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    head = emb.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"),
                                   pa.scalar(50, pa.int64()))),
        batch_format="pyarrow")
    qt = pa.concat_tables(
        [t for t in ray.get(head.to_arrow_refs()) if t.num_columns > 0])
    qt = qt.sort_by([("vec_id", "ascending")])
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qlabs = qt.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ref = ray.put((qids, qlabs, _normalize(_stack(qt))))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "neg_id": pa.array([], pa.int64()),
            "neg_label": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        })
        if b.num_rows == 0:
            return empty
        ids_, labs_, qm = ray.get(ref)
        sims = np.round(_normalize(_stack(b)) @ qm.T, 4)   # (n, nq)
        rl = b.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sims = np.where(rl[:, None] != labs_[None, :], sims, -np.inf)
        best = sims.max(axis=0)                             # local top-1
        ri, qi = np.nonzero((sims >= best[None, :]) & np.isfinite(sims))
        rid = b.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": pa.array(ids_[qi], pa.int64()),
            "neg_id": pa.array(rid[ri], pa.int64()),
            "neg_label": pa.array(rl[ri], pa.int64()),
            "sim": pa.array(sims[ri, qi], pa.float64()),
        })

    local = emb.map_batches(score, batch_format="pyarrow",
                            batch_size=None)
    return grouped_topk(local, "query_id", "sim", 1, descending=True,
                        tiebreak=["neg_id"])


QUERIES["q_embedding_hard_negatives"] = q_embedding_hard_negatives
ORACLE_SQL["q_embedding_hard_negatives"] = """
    WITH q AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 50
    ),
    s AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neg_id,
             e.label AS neg_label,
             round(list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]),
                     CAST(e.embedding AS DOUBLE[])), 4) AS sim
      FROM q JOIN embeddings e ON e.label <> q.label
    ),
    r AS (
      SELECT query_id, neg_id, neg_label, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neg_id) AS rn
      FROM s
    )
    SELECT query_id, neg_id, CAST(neg_label AS BIGINT) AS neg_label, sim
    FROM r WHERE rn = 1
"""


def q_purchase_brier_ece(sf_dir: str):
    """Headline calibration scalars for the value/500 pseudo-score (same
    score convention as q_purchase_calibration): the Brier score
    mean (pred − y)² and the 10-bin Expected Calibration Error
    Σ (n_b/N)·|acc_b − conf_b| — the two numbers a model card quotes
    above the reliability diagram.  One combiner pass carries both the
    global moments and the per-bin cells."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value").to_numpy(zero_copy_only=False)
        pred = np.minimum(v / 500.0, 0.999999)
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        y = (et == "purchase").astype(np.float64)
        return pa.table({
            "bin": pa.array(np.floor(pred * 10.0).astype(np.int64)),
            "pred": pa.array(pred, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "sq": pa.array((pred - y) * (pred - y), pa.float64()),
        })

    cells = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                        ["bin"],
                        [("n", "y", "count"), ("sy", "y", "sum"),
                         ("sp", "pred", "sum"), ("ssq", "sq", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_events": pa.array([], pa.int64()),
            "brier": pa.array([], pa.float64()),
            "ece": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("bin", "ascending")])
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sp = t.column("sp").to_numpy(zero_copy_only=False)
        ssq = t.column("ssq").to_numpy(zero_copy_only=False)
        nt = float(n.sum())
        brier = float(ssq.sum()) / nt
        ece = float(((n / nt) * np.abs(sy / n - sp / n)).sum())
        out = pa.table({
            "n_events": pa.array([int(nt)], pa.int64()),
            "brier": pa.array([brier], pa.float64()),
            "ece": pa.array([ece], pa.float64()),
        })
        for name in ("brier", "ece"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(cells.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_events", "brier", "ece"]),
        batch_format="pyarrow")


QUERIES["q_purchase_brier_ece"] = q_purchase_brier_ece
ORACLE_SQL["q_purchase_brier_ece"] = """
    WITH s AS (
      SELECT least(value / 500.0, 0.999999) AS pred,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT CAST(floor(pred * 10.0) AS BIGINT) AS bin,
             count(*) AS n, sum(y) AS sy, sum(pred) AS sp,
             sum((pred - y) * (pred - y)) AS ssq
      FROM s GROUP BY 1
    ),
    t AS (SELECT sum(n) * 1.0 AS nt FROM b)
    SELECT CAST(nt AS BIGINT) AS n_events,
           round((SELECT sum(ssq) FROM b) / nt, 6) AS brier,
           round((SELECT sum((n / nt) * abs(sy / n - sp / n))
                  FROM b, t), 6) AS ece
    FROM t
"""


def q_purchase_by_event_rank(sf_dir: str):
    """Conversion-depth curve: at which event NUMBER (1st, 2nd, ...) does
    a user first purchase, with the cumulative share of converting users
    by that depth — "how much engagement does a purchase take".  The
    first-purchase rank is read off each user's (ts, event_id)-ordered
    run; the rank histogram is one combiner and the cumulative share a
    prefix sum over the tiny rank table (ranks cap at 20)."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    empty = pa.table({"rank": pa.array([], pa.int64())})

    def first_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        is_p = et == "purchase"
        starts = bounds[:-1]
        run_id = np.repeat(np.arange(len(starts)), np.diff(bounds))
        pos = np.arange(t.num_rows) - starts[run_id] + 1
        # first purchase position per run: min pos among purchases
        big = np.full(len(starts), np.iinfo(np.int64).max)
        np.minimum.at(big, run_id[is_p], pos[is_p])
        got = big[big != np.iinfo(np.int64).max]
        if len(got) == 0:
            return empty
        return pa.table({"rank": pa.array(
            np.minimum(got, 20).astype(np.int64))})

    ranks = grouped_map(
        ev, "user_id", first_rank, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string())})).materialize()
    # materialized once: feeds both the histogram and the total count
    hist = grouped_agg(ranks, ["rank"], [("n_users", "rank", "count")],
                       sum_as_float=False)
    s = range_sort(hist, "rank")
    s = global_prefix_sums(s, "n_users", out_name="__cum",
                           exclusive=False)
    total = float(ranks.count())

    def finish(b: pa.Table) -> pa.Table:
        share = pc.divide(
            pc.multiply(pc.cast(b.column("__cum"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pa.scalar(total, pa.float64()))
        return pa.table({
            "rank": b.column("rank"),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "cum_share": round_like_duckdb(share, 6),
        })

    return s.map_batches(finish, batch_format="pyarrow")


QUERIES["q_purchase_by_event_rank"] = q_purchase_by_event_rank
ORACLE_SQL["q_purchase_by_event_rank"] = """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    f AS (
      SELECT user_id, least(min(rn), 20) AS rank
      FROM r WHERE event_type = 'purchase' GROUP BY 1
    ),
    h AS (SELECT rank, count(*) AS n_users FROM f GROUP BY 1),
    t AS (SELECT count(*) * 1.0 AS total FROM f)
    SELECT rank, n_users,
           round(sum(n_users) OVER (ORDER BY rank) * 1.0
                 / (SELECT total FROM t), 6) AS cum_share
    FROM h
"""


def q_embedding_half_drift(sf_dir: str):
    """Embedding-drift monitor: per label, the cosine between the class
    centroid computed on the even-id half of the corpus and the odd-id
    half — a self-consistency check (≈1 when the embedding space is
    stable; drops when a re-embedding run shifted a class).  Reuses the
    group_vector_mean combiner on a composite (label, half) key; the
    64-dim cosine folds from the ROUND-6 centroids on both sides."""
    from ..stages.agg import grouped_map, round_like_duckdb
    from ..stages.ann import group_vector_mean

    emb = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def keyed(b: pa.Table) -> pa.Table:
        vid = b.column("vec_id")
        half = pc.subtract(vid, pc.multiply(
            pc.divide(vid, pa.scalar(2, pa.int64())),
            pa.scalar(2, pa.int64())))
        lh = pc.add(pc.multiply(pc.cast(b.column("label"), pa.int64()),
                                pa.scalar(2, pa.int64())), half)
        return pa.table({"lh": lh, "embedding": b.column("embedding")})

    cents = group_vector_mean(emb.map_batches(keyed, batch_format="pyarrow"),
                              "lh", col="embedding", round_to=6,
                              out_name="v")

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "label": pa.array([], pa.int64()),
            "centroid_cosine": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("lh", "ascending"), ("dim", "ascending")])
        lh = t.column("lh").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        labels = np.unique(lh // 2)
        out_l, out_c = [], []
        for lab in labels:
            a = v[lh == lab * 2]
            b = v[lh == lab * 2 + 1]
            if len(a) == 0 or len(b) == 0 or len(a) != len(b):
                continue
            den = np.sqrt((a * a).sum()) * np.sqrt((b * b).sum())
            if den <= 0.0:
                continue
            out_l.append(int(lab))
            out_c.append(float((a * b).sum()) / den)
        out = pa.table({
            "label": pa.array(out_l, pa.int64()),
            "centroid_cosine": pa.array(out_c, pa.float64()),
        })
        idx = out.column_names.index("centroid_cosine")
        return out.set_column(
            idx, "centroid_cosine",
            round_like_duckdb(out.column("centroid_cosine"), 6))

    out = grouped_map(cents.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["label", "centroid_cosine"]),
        batch_format="pyarrow")


QUERIES["q_embedding_half_drift"] = q_embedding_half_drift
ORACLE_SQL["q_embedding_half_drift"] = """
    WITH c AS (
      SELECT label, vec_id % 2 AS half, CAST(gs.i AS BIGINT) AS dim,
             round(avg(embedding[gs.i + 1]), 6) AS v
      FROM embeddings CROSS JOIN range(64) AS gs(i)
      WHERE gs.i < len(embedding)
      GROUP BY 1, 2, 3
    )
    SELECT CAST(a.label AS BIGINT) AS label,
           round(sum(a.v * b.v)
                 / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))), 6)
               AS centroid_cosine
    FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
    WHERE a.half = 0 AND b.half = 1
    GROUP BY 1
"""


def q_customer_state_snapshot(sf_dir: str):
    """Temporal snapshot (the bitemporal "state as of T" read): each
    customer's most recent order status/priority as of the dataset's
    midpoint date — reconstructing a dimension's state at a past instant
    from the fact stream.  One filtered map + a map-side-combined
    grouped top-1 per customer (orderdate desc, orderkey desc tiebreak);
    summarized per (status, priority) for a compact report."""
    from ..stages.agg import grouped_agg, grouped_topk

    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderkey", "o_orderdate",
                  "o_orderstatus", "o_orderpriority"])

    bounds = grouped_agg(
        ords.map_batches(
            lambda b: pa.table({
                "__g": pa.array(np.zeros(b.num_rows, np.int8)),
                "us": pc.cast(b.column("o_orderdate"), pa.int64())}),
            batch_format="pyarrow"),
        ["__g"], [("mn", "us", "min"), ("mx", "us", "max")]).take_all()
    mid = (bounds[0]["mn"] + bounds[0]["mx"]) // 2

    def upto(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("o_orderdate"), pa.int64())
        b = b.filter(pc.less_equal(us, pa.scalar(mid, pa.int64())))
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "neg_us": pc.multiply(pc.cast(b.column("o_orderdate"),
                                          pa.int64()),
                                  pa.scalar(-1, pa.int64())),
            "neg_key": pc.multiply(b.column("o_orderkey"),
                                   pa.scalar(-1, pa.int64())),
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
        })

    latest = grouped_topk(
        ords.map_batches(upto, batch_format="pyarrow"),
        "o_custkey", "neg_us", 1, descending=False,
        tiebreak=["neg_key"])
    return grouped_agg(latest, ["o_orderstatus", "o_orderpriority"],
                       [("n_customers", "o_custkey", "count")],
                       sum_as_float=False).map_batches(
        lambda b: pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
            "n_customers": pc.cast(b.column("n_customers"), pa.int64()),
        }), batch_format="pyarrow")


QUERIES["q_customer_state_snapshot"] = q_customer_state_snapshot
ORACLE_SQL["q_customer_state_snapshot"] = """
    WITH b AS (
      SELECT (min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate)))
               // 2 AS mid
      FROM orders
    ),
    r AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders, b WHERE epoch_us(o_orderdate) <= mid
    )
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_customers
    FROM r WHERE rn = 1 GROUP BY 1, 2
"""


def q_value_did(sf_dir: str):
    """Difference-in-differences on event value: hash-split arms ×
    midpoint periods (both established conventions) — DiD =
    (Ā₂−Ā₁) − (B̄₂−B̄₁) with its large-sample SE √(Σ vᵢ/nᵢ) — the
    textbook causal readout when one arm "gets treated" in period 2.
    One mergeable-moment pass to 4 cells, tiny finalize."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sample import deterministic_split

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    bounds = grouped_agg(
        ev.map_batches(
            lambda b: pa.table({
                "__g": pa.array(np.zeros(b.num_rows, np.int8)),
                "us": pc.cast(b.column("ts"), pa.int64())}),
            batch_format="pyarrow"),
        ["__g"], [("mn", "us", "min"), ("mx", "us", "max")]).take_all()
    mid = (bounds[0]["mn"] + bounds[0]["mx"]) // 2

    sp = deterministic_split(ev, id_col="user_id",
                             splits=[("A", 0.5), ("B", 0.5)], seed="ab1",
                             out_col="arm")

    def label(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        us = pc.cast(b.column("ts"), pa.int64())
        return pa.table({
            "arm": b.column("arm"),
            "period": pc.cast(pc.greater_equal(
                us, pa.scalar(mid, pa.int64())), pa.int64()),
            "value": b.column("value"),
        })

    g = grouped_agg(sp.map_batches(label, batch_format="pyarrow"),
                    ["arm", "period"],
                    [("n", "value", "count"), ("m", "value", "mean"),
                     ("v", "value", "var")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "did": pa.array([], pa.float64()),
            "se_did": pa.array([], pa.float64()),
            "z_did": pa.array([], pa.float64()),
        })
        rows = {(r["arm"], r["period"]): r for r in t.to_pylist()}
        need = [("A", 0), ("A", 1), ("B", 0), ("B", 1)]
        if any(k not in rows for k in need):
            return empty
        a1, a2 = rows[("A", 0)], rows[("A", 1)]
        b1, b2 = rows[("B", 0)], rows[("B", 1)]
        did = (a2["m"] - a1["m"]) - (b2["m"] - b1["m"])
        if any(r["v"] is None for r in (a1, a2, b1, b2)):
            se = z = None
        else:
            se = float(np.sqrt(a1["v"] / a1["n"] + a2["v"] / a2["n"]
                               + b1["v"] / b1["n"] + b2["v"] / b2["n"]))
            z = did / se if se > 0.0 else None
        out = pa.table({
            "did": pa.array([did], pa.float64()),
            "se_did": pa.array([se], pa.float64()),
            "z_did": pa.array([z], pa.float64()),
        })
        for name in ("did", "se_did", "z_did"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["did", "se_did", "z_did"]),
        batch_format="pyarrow")


QUERIES["q_value_did"] = q_value_did
ORACLE_SQL["q_value_did"] = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, value
      FROM events WHERE value IS NOT NULL
    ),
    bb AS (
      SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
      FROM events
    ),
    s AS (
      SELECT {_ab_split_case()} AS arm,
             CASE WHEN us >= (SELECT mid FROM bb) THEN 1 ELSE 0 END
               AS period,
             value
      FROM e
    ),
    g AS (
      SELECT arm, period, count(*) AS n, avg(value) AS m,
             var_samp(value) AS v
      FROM s GROUP BY 1, 2
    )
    SELECT round((a2.m - a1.m) - (b2.m - b1.m), 6) AS did,
           round(sqrt(a1.v/a1.n + a2.v/a2.n + b1.v/b1.n + b2.v/b2.n), 6)
               AS se_did,
           round(((a2.m - a1.m) - (b2.m - b1.m))
                 / sqrt(a1.v/a1.n + a2.v/a2.n + b1.v/b1.n + b2.v/b2.n), 6)
               AS z_did
    FROM g a1, g a2, g b1, g b2
    WHERE a1.arm = 'A' AND a1.period = 0 AND a2.arm = 'A' AND a2.period = 1
      AND b1.arm = 'B' AND b1.period = 0 AND b2.arm = 'B' AND b2.period = 1
"""


def q_region_nation_share(sf_dir: str):
    """Hierarchical contribution table: each nation's exact-cents revenue
    with its share WITHIN its region and the region's share of the world
    — the drill-down percent-of-parent readout.  One broadcast dim chain
    + a nation-level cents combiner; both share levels are exact integer
    ratios off the tiny nation table."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                      "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_nationkey"])
    j = broadcast_join(j, nation, left_key="c_nationkey",
                       right_key="n_nationkey",
                       columns=["n_name", "n_regionkey"])
    j = broadcast_join(j, region, left_key="n_regionkey",
                       right_key="r_regionkey", columns=["r_name"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": b.column("r_name"),
            "n_name": b.column("n_name"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    g = grouped_agg(j.map_batches(cents, batch_format="pyarrow"),
                    ["r_name", "n_name"], [("c", "c", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "r_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "revenue": pa.array([], pa.float64()),
            "share_in_region": pa.array([], pa.float64()),
            "region_share_world": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("r_name", "ascending"), ("n_name", "ascending")])
        r = t.column("r_name").to_numpy(zero_copy_only=False)
        nn = t.column("n_name").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        ur, ri = np.unique(r, return_inverse=True)
        rtot = np.zeros(len(ur), np.int64)
        np.add.at(rtot, ri, c)
        wtot = int(c.sum())
        out = pa.table({
            "r_name": pa.array(r, pa.string()),
            "n_name": pa.array(nn, pa.string()),
            "revenue": pa.array(c / 100.0, pa.float64()),
            "share_in_region": round_like_duckdb(
                pa.array(c * 1.0 / rtot[ri], pa.float64()), 6),
            "region_share_world": round_like_duckdb(
                pa.array(rtot[ri] * 1.0 / wtot, pa.float64()), 6),
        })
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["r_name", "n_name", "revenue",
                            "share_in_region", "region_share_world"]),
        batch_format="pyarrow")


QUERIES["q_region_nation_share"] = q_region_nation_share
ORACLE_SQL["q_region_nation_share"] = """
    WITH g AS (
      SELECT r_name, n_name,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    ),
    r AS (SELECT r_name, sum(c) AS rc FROM g GROUP BY 1),
    w AS (SELECT sum(c) AS wc FROM g)
    SELECT g.r_name, n_name, CAST(c AS DOUBLE) / 100.0 AS revenue,
           round(c * 1.0 / rc, 6) AS share_in_region,
           round(rc * 1.0 / wc, 6) AS region_share_world
    FROM g JOIN r USING (r_name), w
"""


def q_event_next_type_accuracy(sf_dir: str):
    """Baseline sequence-model score: accuracy of always predicting the
    most likely next event type given the current one (the majority-vote
    Markov baseline every fancier model must beat): Σ_src max_dst n / N.
    Reuses the transition-count pipeline; the argmax fold runs over the
    ≤|types|² cell table."""
    from ..stages.agg import grouped_map, round_like_duckdb

    counts = q_event_type_transitions(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_transitions": pa.array([], pa.int64()),
            "baseline_accuracy": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        src = t.column("src_type").to_numpy(zero_copy_only=False)
        n = t.column("n_transitions").to_numpy(
            zero_copy_only=False).astype(np.int64)
        us, si = np.unique(src, return_inverse=True)
        mx = np.zeros(len(us), np.int64)
        np.maximum.at(mx, si, n)
        nt = int(n.sum())
        acc = float(mx.sum()) * 1.0 / nt
        out = pa.table({
            "n_transitions": pa.array([nt], pa.int64()),
            "baseline_accuracy": pa.array([acc], pa.float64()),
        })
        idx = out.column_names.index("baseline_accuracy")
        return out.set_column(
            idx, "baseline_accuracy",
            round_like_duckdb(out.column("baseline_accuracy"), 6))

    out = grouped_map(counts.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_transitions", "baseline_accuracy"]),
        batch_format="pyarrow")


QUERIES["q_event_next_type_accuracy"] = q_event_next_type_accuracy
ORACLE_SQL["q_event_next_type_accuracy"] = """
    WITH p AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src,
             event_type AS dst
      FROM events
    ),
    c AS (SELECT src, dst, count(*) AS n FROM p WHERE src IS NOT NULL
          GROUP BY 1, 2),
    m AS (SELECT src, max(n) AS mx FROM c GROUP BY 1),
    t AS (SELECT sum(n) AS nt FROM c)
    SELECT CAST(nt AS BIGINT) AS n_transitions,
           round((SELECT sum(mx) FROM m) * 1.0 / nt, 6)
               AS baseline_accuracy
    FROM t
"""


def q_user_churn_risk(sf_dir: str):
    """Churn-risk screen: a user is AT RISK when their silence since
    their last event exceeds their own p90 inter-event gap (personalized
    inactivity threshold — the re-engagement trigger list).  Gaps, the
    per-user p90 (exact interpolated quantile) and the recency check all
    run inside one per-user co-partition kernel; only users with ≥ 5
    gaps are scored.  Returns the one-row risk summary."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    bounds = grouped_agg(
        ev.map_batches(
            lambda b: pa.table({
                "__g": pa.array(np.zeros(b.num_rows, np.int8)),
                "us": pc.cast(b.column("ts"), pa.int64())}),
            batch_format="pyarrow"),
        ["__g"], [("mx", "us", "max")]).take_all()
    horizon = bounds[0]["mx"]

    empty = pa.table({"__g": pa.array([], pa.int8()),
                      "scored": pa.array([], pa.int64()),
                      "at_risk": pa.array([], pa.int64())})

    def risk_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        b2 = _key_run_bounds(t, ["user_id"])
        us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        scored, at_risk = [], []
        for i in range(len(b2) - 1):
            lo, hi = int(b2[i]), int(b2[i + 1])
            if hi - lo < 6:            # needs >= 5 gaps
                continue
            gaps = np.sort((us[lo + 1:hi] - us[lo:hi - 1]).astype(
                np.float64))
            h = (len(gaps) - 1) * 0.9
            g_lo = int(np.floor(h))
            p90 = (gaps[g_lo] if h == g_lo
                   else gaps[g_lo] + (gaps[g_lo + 1] - gaps[g_lo])
                   * (h - g_lo))
            silence = float(horizon - us[hi - 1])
            scored.append(1)
            at_risk.append(1 if silence > p90 else 0)
        if not scored:
            return empty
        return pa.table({
            "__g": pa.array(np.zeros(len(scored), np.int8)),
            "scored": pa.array(scored, pa.int64()),
            "at_risk": pa.array(at_risk, pa.int64()),
        })

    flags = grouped_map(
        ev, "user_id", risk_part, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64())}))
    g = grouped_agg(flags, ["__g"],
                    [("n_scored", "scored", "sum"),
                     ("n_at_risk", "at_risk", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        if "n_scored" not in b.column_names:
            return pa.table({
                "n_scored": pa.array([], pa.int64()),
                "n_at_risk": pa.array([], pa.int64()),
                "at_risk_share": pa.array([], pa.float64()),
            })
        n = pc.cast(b.column("n_scored"), pa.float64())
        share = pc.divide(pc.cast(b.column("n_at_risk"), pa.float64()), n)
        return pa.table({
            "n_scored": pc.cast(b.column("n_scored"), pa.int64()),
            "n_at_risk": pc.cast(b.column("n_at_risk"), pa.int64()),
            "at_risk_share": round_like_duckdb(share, 6),
        })

    g = g.map_batches(lambda b: b.drop_columns(["__g"])
                      if "__g" in b.column_names else b,
                      batch_format="pyarrow")
    return g.map_batches(finish, batch_format="pyarrow")


QUERIES["q_user_churn_risk"] = q_user_churn_risk
ORACLE_SQL["q_user_churn_risk"] = """
    WITH h AS (SELECT max(epoch_us(ts)) AS horizon FROM events),
    g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap,
             epoch_us(ts) AS us
      FROM events
    ),
    u AS (
      SELECT user_id,
             quantile_cont(gap * 1.0, 0.9) AS p90,
             max(us) AS last_us,
             count(gap) AS n_gaps
      FROM g GROUP BY 1
    )
    SELECT count(*) AS n_scored,
           sum(CASE WHEN (horizon - last_us) * 1.0 > p90
                    THEN 1 ELSE 0 END) AS n_at_risk,
           round(sum(CASE WHEN (horizon - last_us) * 1.0 > p90
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS at_risk_share
    FROM u, h WHERE n_gaps >= 5
"""


def q_embedding_dim_variance(sf_dir: str):
    """Embedding-space diagnostics: per-dimension mean and variance over
    the corpus — dead dimensions (≈0 variance) and dominant ones show up
    immediately (the PCA-lite screen before a whitening decision).
    Map-side per-dim (n, Σx, Σx²) partials collapse each block to 64
    rows; one tiny combiner + finalize."""
    from ..stages.agg import grouped_agg, round_like_duckdb
    from ..stages.ann import _stack

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partials(b: pa.Table) -> pa.Table:
        m = _stack(b).astype(np.float64)
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "n": pa.array(np.full(m.shape[1], m.shape[0], np.int64)),
            "s1": pa.array(m.sum(axis=0), pa.float64()),
            "s2": pa.array((m * m).sum(axis=0), pa.float64()),
        })

    g = grouped_agg(emb.map_batches(partials, batch_format="pyarrow"),
                    ["dim"], [("n", "n", "sum"), ("s1", "s1", "sum"),
                              ("s2", "s2", "sum")])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        mean = pc.divide(b.column("s1"), n)
        var = pc.divide(
            pc.subtract(b.column("s2"),
                        pc.divide(pc.multiply(b.column("s1"),
                                              b.column("s1")), n)),
            pc.subtract(n, pa.scalar(1.0, pa.float64())))
        return pa.table({
            "dim": b.column("dim"),
            "mean": round_like_duckdb(mean, 6),
            "variance": round_like_duckdb(var, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_embedding_dim_variance"] = q_embedding_dim_variance
ORACLE_SQL["q_embedding_dim_variance"] = """
    SELECT CAST(gs.i AS BIGINT) AS dim,
           round(avg(CAST(embedding[gs.i + 1] AS DOUBLE)), 6) AS mean,
           round((sum(CAST(embedding[gs.i + 1] AS DOUBLE)
                      * embedding[gs.i + 1])
                  - sum(CAST(embedding[gs.i + 1] AS DOUBLE))
                    * sum(CAST(embedding[gs.i + 1] AS DOUBLE)) / count(*))
                 / (count(*) - 1.0), 6) AS variance
    FROM embeddings CROSS JOIN range(64) AS gs(i)
    WHERE gs.i < len(embedding)
    GROUP BY gs.i
"""


def q_customer_value_zscore(sf_dir: str):
    """Feature standardization at scale (the ML-prep staple): z-score of
    each customer's account balance against the global mean/std — the
    two scalars come from ONE moment fold and broadcast into a pure map;
    reported as the top-20 |z| outliers (deterministic round-6 ranking,
    key tiebreak)."""
    from ..stages.agg import global_topk, grouped_agg, round_like_duckdb

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    g = grouped_agg(
        cust.map_batches(
            lambda b: pa.table({
                "__g": pa.array(np.zeros(b.num_rows, np.int8)),
                "v": b.column("c_acctbal")}),
            batch_format="pyarrow"),
        ["__g"], [("m", "v", "mean"), ("sd", "v", "std")]).take_all()
    mu, sd = g[0]["m"], g[0]["sd"]

    def score(b: pa.Table) -> pa.Table:
        z = pc.divide(pc.subtract(b.column("c_acctbal"), pa.scalar(mu)),
                      pa.scalar(sd))
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_acctbal": b.column("c_acctbal"),
            "abs_z": round_like_duckdb(pc.abs(z), 6),
        })

    return global_topk(cust.map_batches(score, batch_format="pyarrow"),
                       ["abs_z", "c_custkey"], 20,
                       descending=[True, False])


QUERIES["q_customer_value_zscore"] = q_customer_value_zscore
ORACLE_SQL["q_customer_value_zscore"] = """
    WITH m AS (SELECT avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sd
               FROM customer)
    SELECT c_custkey, c_acctbal,
           round(abs((c_acctbal - mu) / sd), 6) AS abs_z
    FROM customer, m
    ORDER BY abs_z DESC, c_custkey LIMIT 20
"""


def q_revenue_cagr(sf_dir: str):
    """Compound monthly growth rate of revenue: (last/first)^(1/(n−1))−1
    over the monthly exact-cents series — the single growth headline.
    One combiner to the monthly table; first/last/n read off it in a
    tiny finalize with the identical pow tree."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(b.column("o_orderdate"),
                                       unit="month"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    monthly = grouped_agg(ords.map_batches(proj, batch_format="pyarrow"),
                          ["month"], [("c", "c", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_months": pa.array([], pa.int64()),
            "first_revenue": pa.array([], pa.float64()),
            "last_revenue": pa.array([], pa.float64()),
            "cmgr": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("month", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False)
        n = len(c)
        first, last = float(c[0]), float(c[-1])
        cmgr = ((last / first) ** (1.0 / (n - 1.0)) - 1.0
                if first > 0.0 else None)
        out = pa.table({
            "n_months": pa.array([n], pa.int64()),
            "first_revenue": pa.array([first / 100.0], pa.float64()),
            "last_revenue": pa.array([last / 100.0], pa.float64()),
            "cmgr": pa.array([cmgr], pa.float64()),
        })
        idx = out.column_names.index("cmgr")
        return out.set_column(idx, "cmgr",
                              round_like_duckdb(out.column("cmgr"), 6))

    out = grouped_map(monthly.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_months", "first_revenue", "last_revenue",
                            "cmgr"]),
        batch_format="pyarrow")


QUERIES["q_revenue_cagr"] = q_revenue_cagr
ORACLE_SQL["q_revenue_cagr"] = """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    o AS (
      SELECT c, row_number() OVER (ORDER BY month) AS rn,
             count(*) OVER () AS n
      FROM m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM o LIMIT 1) AS n_months,
           (SELECT CAST(c AS DOUBLE) / 100.0 FROM o WHERE rn = 1)
               AS first_revenue,
           (SELECT CAST(c AS DOUBLE) / 100.0 FROM o WHERE rn = n)
               AS last_revenue,
           round(CASE WHEN (SELECT c FROM o WHERE rn = 1) > 0 THEN
                     pow((SELECT CAST(c AS DOUBLE) FROM o WHERE rn = n)
                         / (SELECT CAST(c AS DOUBLE) FROM o WHERE rn = 1),
                         1.0 / ((SELECT n FROM o LIMIT 1) - 1.0)) - 1.0
                 END, 6) AS cmgr
"""


def q_daily_revenue_dense(sf_dir: str):
    """Calendar densification (the gap-filling ETL step): one row per
    calendar day between the first and last order date, zero-filled
    revenue on silent days plus a was-active flag — what every
    time-series model consumes.  The combiner daily table merges with a
    driver-generated day spine (tiny: one int per day) via a
    co-partitioned left join; reported as the per-month count of silent
    days to keep the verified surface compact."""
    from ..stages.agg import grouped_agg
    from ..stages.joins import hash_join
    import ray

    daily = _daily_order_revenue_cents(sf_dir).materialize()
    bounds = grouped_agg(
        daily.map_batches(
            lambda b: b.append_column(
                "__g", pa.array(np.zeros(b.num_rows, np.int8))),
            batch_format="pyarrow"),
        ["__g"], [("mn", "day", "min"), ("mx", "day", "max")]).take_all()
    lo, hi = bounds[0]["mn"], bounds[0]["mx"]
    spine = ray.data.from_arrow(pa.table({
        "day": pa.array(np.arange(lo, hi + 1, dtype=np.int64))}))

    j = hash_join(spine, daily, left_key="day", right_key="day",
                  how="left outer")

    def label(b: pa.Table) -> pa.Table:
        silent = pc.cast(pc.is_null(b.column("c")), pa.int64())
        month = pc.divide(b.column("day"), pa.scalar(30, pa.int64()))
        return pa.table({"epoch_month30": month, "silent": silent,
                         "day": b.column("day")})

    g = grouped_agg(j.map_batches(label, batch_format="pyarrow"),
                    ["epoch_month30"],
                    [("n_days", "day", "count"),
                     ("n_silent", "silent", "sum")])
    return g.map_batches(
        lambda b: pa.table({
            "epoch_month30": b.column("epoch_month30"),
            "n_days": pc.cast(b.column("n_days"), pa.int64()),
            "n_silent": pc.cast(b.column("n_silent"), pa.int64()),
        }), batch_format="pyarrow")


QUERIES["q_daily_revenue_dense"] = q_daily_revenue_dense
ORACLE_SQL["q_daily_revenue_dense"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
      FROM orders GROUP BY 1
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT lo + CAST(k.range AS BIGINT) AS day
      FROM b, range(0, 100000) k
      WHERE lo + k.range <= hi
    )
    SELECT spine.day // 30 AS epoch_month30,
           count(*) AS n_days,
           sum(CASE WHEN d.day IS NULL THEN 1 ELSE 0 END) AS n_silent
    FROM spine LEFT JOIN d ON d.day = spine.day
    GROUP BY 1
"""


def q_revenue_bennet_decomposition(sf_dir: str):
    """Bennet price/volume decomposition of month-over-month revenue
    change: ΔRev ≡ Δq·(p̄) + Δp·(q̄) with midpoint weights — how much of
    each month's growth came from selling MORE units vs selling at
    HIGHER prices (an exact identity, so the two effects sum to the
    delta).  One combiner to the monthly (units, cents) table; lag and
    the decomposition finalize over the tiny series."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(b.column("l_shipdate"),
                                       unit="month"),
            "q": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("l_extendedprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    monthly = grouped_agg(li.map_batches(proj, batch_format="pyarrow"),
                          ["month"], [("q", "q", "sum"),
                                      ("c", "c", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "month": pa.array([], pa.timestamp("us")),
            "delta_revenue": pa.array([], pa.float64()),
            "volume_effect": pa.array([], pa.float64()),
            "price_effect": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("month", "ascending")])
        q = t.column("q").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64) \
            / 100.0
        p = c / q
        dq, dp = q[1:] - q[:-1], p[1:] - p[:-1]
        pbar, qbar = (p[1:] + p[:-1]) / 2.0, (q[1:] + q[:-1]) / 2.0
        out = pa.table({
            "month": t.column("month").slice(1),
            "delta_revenue": pa.array(c[1:] - c[:-1], pa.float64()),
            "volume_effect": pa.array(dq * pbar, pa.float64()),
            "price_effect": pa.array(dp * qbar, pa.float64()),
        })
        for name in ("delta_revenue", "volume_effect", "price_effect"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(monthly.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["month", "delta_revenue", "volume_effect",
                            "price_effect"]),
        batch_format="pyarrow")


QUERIES["q_revenue_bennet_decomposition"] = q_revenue_bennet_decomposition
ORACLE_SQL["q_revenue_bennet_decomposition"] = """
    WITH m AS (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS q,
             CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS c
      FROM lineitem GROUP BY 1
    ),
    l AS (
      SELECT month, q, c, c / q AS p,
             lag(q) OVER (ORDER BY month) AS pq,
             lag(c) OVER (ORDER BY month) AS pcr,
             lag(c / q) OVER (ORDER BY month) AS pp
      FROM m
    )
    SELECT month,
           round(c - pcr, 6) AS delta_revenue,
           round((q - pq) * ((p + pp) / 2.0), 6) AS volume_effect,
           round((p - pp) * ((q + pq) / 2.0), 6) AS price_effect
    FROM l WHERE pq IS NOT NULL
"""


def q_nation_rank_consistency(sf_dir: str):
    """Cross-metric rank consistency: Spearman correlation between each
    nation's rank by order count and by exact-cents revenue — "do bigger
    markets also spend proportionally?".  Two keyed aggregates roll the
    stream to ≤|nations| rows; fractional ranks and the rank correlation
    fold on that tiny table with exact half-integer arithmetic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_nationkey"])
    j = broadcast_join(j, nation, left_key="c_nationkey",
                       right_key="n_nationkey", columns=["n_name"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b.column("n_name"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    g = grouped_agg(j.map_batches(cents, batch_format="pyarrow"),
                    ["n_name"], [("n_orders", "c", "count"),
                                 ("c", "c", "sum")])

    def _franks(v: np.ndarray) -> np.ndarray:
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            jj = i
            while jj < len(v) and sv[jj] == sv[i]:
                jj += 1
            ranks[order[i:jj]] = (i + jj + 1) / 2.0
            i = jj
        return ranks

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_nations": pa.array([], pa.int64()),
            "rank_spearman": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("n_name", "ascending")])
        no = t.column("n_orders").to_numpy(
            zero_copy_only=False).astype(np.float64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        rx, ry = _franks(no), _franks(c)
        n = float(len(rx))
        sx, sy = rx.sum(), ry.sum()
        num = n * (rx * ry).sum() - sx * sy
        dx = n * (rx * rx).sum() - sx * sx
        dy = n * (ry * ry).sum() - sy * sy
        rho = num / np.sqrt(dx * dy) if dx > 0.0 and dy > 0.0 else None
        out = pa.table({
            "n_nations": pa.array([int(n)], pa.int64()),
            "rank_spearman": pa.array([rho], pa.float64()),
        })
        idx = out.column_names.index("rank_spearman")
        return out.set_column(
            idx, "rank_spearman",
            round_like_duckdb(out.column("rank_spearman"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_nations", "rank_spearman"]),
        batch_format="pyarrow")


QUERIES["q_nation_rank_consistency"] = q_nation_rank_consistency
ORACLE_SQL["q_nation_rank_consistency"] = """
    WITH g AS (
      SELECT n_name, count(*) AS n_orders,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    ),
    r AS (
      SELECT rank() OVER (ORDER BY n_orders)
               + (count(*) OVER (PARTITION BY n_orders) - 1) / 2.0 AS rx,
             rank() OVER (ORDER BY c)
               + (count(*) OVER (PARTITION BY c) - 1) / 2.0 AS ry
      FROM g
    )
    SELECT count(*) AS n_nations,
           round((count(*) * sum(rx * ry) - sum(rx) * sum(ry))
                 / sqrt((count(*) * sum(rx * rx) - sum(rx) * sum(rx))
                        * (count(*) * sum(ry * ry) - sum(ry) * sum(ry))),
                 6) AS rank_spearman
    FROM r
"""


def q_activation_time(sf_dir: str):
    """Activation metric: days from a user's FIRST event to their FIRST
    purchase, summarized per signup cohort week (median + p90 + share
    who ever purchased) — the onboarding-speed headline.  Two keyed MIN
    aggregates in ONE combiner pass (conditional min via a purchase-only
    timestamp column), then a per-cohort exact quantile."""
    from ..stages.agg import grouped_agg, grouped_map, \
        round_like_duckdb, _key_run_bounds

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def proj(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        is_p = pc.equal(b.column("event_type"), pa.scalar("purchase"))
        return pa.table({
            "user_id": b.column("user_id"),
            "us": us,
            "pus": pc.if_else(is_p, us, pa.scalar(None, pa.int64())),
        })

    u = grouped_agg(ev.map_batches(proj, batch_format="pyarrow"),
                    ["user_id"], [("first_us", "us", "min"),
                                  ("first_purchase_us", "pus", "min")])

    def cohort(b: pa.Table) -> pa.Table:
        fw = pc.divide(b.column("first_us"),
                       pa.scalar(604_800_000_000, pa.int64()))
        gap = pc.divide(pc.subtract(b.column("first_purchase_us"),
                                    b.column("first_us")),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"cohort_week": fw,
                         "gap_days": pc.cast(gap, pa.float64()),
                         "converted": pc.cast(
                             pc.is_valid(b.column("first_purchase_us")),
                             pa.int64())})

    c = u.map_batches(cohort, batch_format="pyarrow")
    empty = pa.table({
        "cohort_week": pa.array([], pa.int64()),
        "n_users": pa.array([], pa.int64()),
        "n_converted": pa.array([], pa.int64()),
        "median_days": pa.array([], pa.float64()),
        "p90_days": pa.array([], pa.float64()),
    })

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("cohort_week", "ascending"),
                       ("gap_days", "ascending")])
        bounds = _key_run_bounds(t, ["cohort_week"])
        cw = t.column("cohort_week").to_numpy(zero_copy_only=False)
        gap = t.column("gap_days").to_numpy(zero_copy_only=False)
        conv = t.column("converted").to_numpy(zero_copy_only=False)
        rows = {"cohort_week": [], "n_users": [], "n_converted": [],
                "median_days": [], "p90_days": []}

        def quant(vals, q):
            h = (len(vals) - 1) * q
            lo = int(np.floor(h))
            return (vals[lo] if h == lo
                    else vals[lo] + (vals[lo + 1] - vals[lo]) * (h - lo))

        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            g = gap[lo:hi]
            g = g[~np.isnan(g)]
            rows["cohort_week"].append(int(cw[lo]))
            rows["n_users"].append(hi - lo)
            rows["n_converted"].append(int(conv[lo:hi].sum()))
            rows["median_days"].append(
                float(quant(g, 0.5)) if len(g) else None)
            rows["p90_days"].append(
                float(quant(g, 0.9)) if len(g) else None)
        out = pa.table({
            "cohort_week": pa.array(rows["cohort_week"], pa.int64()),
            "n_users": pa.array(rows["n_users"], pa.int64()),
            "n_converted": pa.array(rows["n_converted"], pa.int64()),
            "median_days": pa.array(rows["median_days"], pa.float64()),
            "p90_days": pa.array(rows["p90_days"], pa.float64()),
        })
        for name in ("median_days", "p90_days"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    return grouped_map(c, "cohort_week", kernel, per_group=False,
                       empty_schema=pa.table({
                           "cohort_week": pa.array([], pa.int64()),
                           "gap_days": pa.array([], pa.float64()),
                           "converted": pa.array([], pa.int64())}))


QUERIES["q_activation_time"] = q_activation_time
ORACLE_SQL["q_activation_time"] = """
    WITH u AS (
      SELECT user_id, min(epoch_us(ts)) AS first_us,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) END) AS fp
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT first_us // 604800000000 AS cohort_week,
             CAST((fp - first_us) // 86400000000 AS DOUBLE) AS gap_days,
             CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS converted
      FROM u
    )
    SELECT cohort_week, count(*) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(quantile_cont(gap_days, 0.5), 6) AS median_days,
           round(quantile_cont(gap_days, 0.9), 6) AS p90_days
    FROM c GROUP BY 1
"""


def q_d7_retention_by_entry_type(sf_dir: str):
    """Acquisition-quality split: D7 retention (second distinct active
    day within 7 days of the first) broken down by the user's ENTRY
    event type — which front door brings users who come back.  The
    per-user kernel reads entry type, first and second day off one
    time-sorted run; the per-type fold is exact integers."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    empty = pa.table({"entry_type": pa.array([], pa.string()),
                      "retained": pa.array([], pa.int64())})

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        bounds = _key_run_bounds(t, ["user_id"])
        us = pc.cast(t.column("ts").combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        entry, ret = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = day[lo:hi]
            fd = d[0]
            nxt = d[d > fd]
            entry.append(et[lo])
            ret.append(1 if len(nxt) and nxt.min() - fd <= 7 else 0)
        return pa.table({"entry_type": pa.array(entry, pa.string()),
                         "retained": pa.array(ret, pa.int64())})

    flags = grouped_map(
        ev, "user_id", kern, per_group=False,
        empty_schema=pa.table({
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string())}))
    g = grouped_agg(flags, ["entry_type"],
                    [("n_users", "retained", "count"),
                     ("n_retained", "retained", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n_users"), pa.float64())
        rate = pc.divide(pc.cast(b.column("n_retained"), pa.float64()), n)
        return pa.table({
            "entry_type": b.column("entry_type"),
            "n_users": pc.cast(b.column("n_users"), pa.int64()),
            "n_retained": pc.cast(b.column("n_retained"), pa.int64()),
            "d7_rate": round_like_duckdb(rate, 6),
        })

    return g.map_batches(finish, batch_format="pyarrow")


QUERIES["q_d7_retention_by_entry_type"] = q_d7_retention_by_entry_type
ORACLE_SQL["q_d7_retention_by_entry_type"] = """
    WITH r AS (
      SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    f AS (SELECT user_id, event_type AS entry_type, day AS fd
          FROM r WHERE rn = 1),
    s AS (
      SELECT r.user_id, min(r.day) AS sd
      FROM r JOIN f USING (user_id)
      WHERE r.day > fd GROUP BY 1
    )
    SELECT entry_type, count(*) AS n_users,
           sum(CASE WHEN sd - fd <= 7 THEN 1 ELSE 0 END) AS n_retained,
           round(sum(CASE WHEN sd - fd <= 7 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS d7_rate
    FROM f LEFT JOIN s USING (user_id)
    GROUP BY 1
"""


def q_priority_size_gamma(sf_dir: str):
    """Goodman-Kruskal gamma between two ORDINAL variables: order
    priority level (1-URGENT … 5-LOW) and order-value quintile — do
    urgent orders skew large?  The 5×5 contingency comes from one
    combiner (quintile edges are exact global quantiles); concordant /
    discordant pair counts fold over the 25 cells in exact integer math,
    so γ = (C−D)/(C+D) is bitwise deterministic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    qs = global_exact_quantiles(
        ords, "o_totalprice",
        [("q1", 0.2), ("q2", 0.4), ("q3", 0.6), ("q4", 0.8)], round_to=6)
    edges = [qs["q1"], qs["q2"], qs["q3"], qs["q4"]]

    def cells(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        # side="left" == #{edges < v}: a value equal to an edge stays in
        # the LOWER bucket, matching the oracle's strict v > edge CASEs
        quint = np.searchsorted(np.array(edges), v, side="left")
        pr = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        lvl = np.array([int(p.split("-")[0]) for p in pr], np.int64)
        return pa.table({"lvl": pa.array(lvl, pa.int64()),
                         "quint": pa.array(quint.astype(np.int64))})

    g = grouped_agg(ords.map_batches(cells, batch_format="pyarrow"),
                    ["lvl", "quint"], [("n", "lvl", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_concordant": pa.array([], pa.int64()),
            "n_discordant": pa.array([], pa.int64()),
            "gamma": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        lvl = t.column("lvl").to_numpy(zero_copy_only=False)
        qu = t.column("quint").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        C = D = 0
        for i in range(len(n)):
            conc = (lvl > lvl[i]) & (qu > qu[i])
            disc = (lvl > lvl[i]) & (qu < qu[i])
            C += int(n[i]) * int(n[conc].sum())
            D += int(n[i]) * int(n[disc].sum())
        gamma = (C - D) * 1.0 / (C + D) if C + D > 0 else None
        out = pa.table({
            "n_concordant": pa.array([C], pa.int64()),
            "n_discordant": pa.array([D], pa.int64()),
            "gamma": pa.array([gamma], pa.float64()),
        })
        idx = out.column_names.index("gamma")
        return out.set_column(idx, "gamma",
                              round_like_duckdb(out.column("gamma"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_concordant", "n_discordant", "gamma"]),
        batch_format="pyarrow")


QUERIES["q_priority_size_gamma"] = q_priority_size_gamma
ORACLE_SQL["q_priority_size_gamma"] = """
    WITH e AS (
      SELECT round(quantile_cont(o_totalprice, 0.2), 6) AS q1,
             round(quantile_cont(o_totalprice, 0.4), 6) AS q2,
             round(quantile_cont(o_totalprice, 0.6), 6) AS q3,
             round(quantile_cont(o_totalprice, 0.8), 6) AS q4
      FROM orders
    ),
    s AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
             CASE WHEN o_totalprice > q4 THEN 4
                  WHEN o_totalprice > q3 THEN 3
                  WHEN o_totalprice > q2 THEN 2
                  WHEN o_totalprice > q1 THEN 1
                  ELSE 0 END AS quint
      FROM orders, e
    ),
    c AS (SELECT lvl, quint, count(*) AS n FROM s GROUP BY 1, 2),
    p AS (
      SELECT sum(a.n * b.n) FILTER (WHERE b.lvl > a.lvl
                                      AND b.quint > a.quint) AS conc,
             sum(a.n * b.n) FILTER (WHERE b.lvl > a.lvl
                                      AND b.quint < a.quint) AS disc
      FROM c a, c b
    )
    SELECT CAST(conc AS BIGINT) AS n_concordant,
           CAST(disc AS BIGINT) AS n_discordant,
           round((conc - disc) * 1.0 / (conc + disc), 6) AS gamma
    FROM p
"""


def q_weekend_value_hellinger(sf_dir: str):
    """Hellinger distance between the weekday and weekend value
    distributions over shared global deciles — the bounded [0,1]
    distribution distance next to the KS statistic and PSI: H =
    √(1 − Σ√(pᵢqᵢ)).  Decile edges are exact global quantiles (round-6,
    shared by both sides); the 10×2 share table folds exactly."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    labeled = _weekend_labeled_events(sf_dir)
    vals = labeled.map_batches(
        lambda b: b.select(["value"]).filter(
            pc.is_valid(b.column("value"))),
        batch_format="pyarrow")
    qs = global_exact_quantiles(
        vals, "value",
        [(f"q{i}", i / 10.0) for i in range(1, 10)], round_to=6)
    edges = np.array([qs[f"q{i}"] for i in range(1, 10)])

    def cells(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value").to_numpy(zero_copy_only=False)
        # strict v > edge semantics (see q_priority_size_gamma)
        dec = np.searchsorted(edges, v, side="left")
        wkd = (b.column("variant").to_numpy(zero_copy_only=False)
               == "weekend").astype(np.int64)
        return pa.table({"decile": pa.array(dec.astype(np.int64)),
                         "wk": pa.array(wkd),
                         "wd": pa.array(1 - wkd)})

    g = grouped_agg(labeled.map_batches(cells, batch_format="pyarrow"),
                    ["decile"], [("nk", "wk", "sum"), ("nd", "wd", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "bhattacharyya": pa.array([], pa.float64()),
            "hellinger": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("decile", "ascending")])
        nk = t.column("nk").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nd = t.column("nd").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tk, td = nk.sum(), nd.sum()
        if tk == 0.0 or td == 0.0:
            return empty
        bc = float(np.sqrt((nk / tk) * (nd / td)).sum())
        h = float(np.sqrt(max(1.0 - bc, 0.0)))
        out = pa.table({
            "bhattacharyya": pa.array([bc], pa.float64()),
            "hellinger": pa.array([h], pa.float64()),
        })
        for name in ("bhattacharyya", "hellinger"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["bhattacharyya", "hellinger"]),
        batch_format="pyarrow")


QUERIES["q_weekend_value_hellinger"] = q_weekend_value_hellinger
ORACLE_SQL["q_weekend_value_hellinger"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1 ELSE 0 END AS wk,
             value
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT round(quantile_cont(value, 0.1), 6) AS q1,
             round(quantile_cont(value, 0.2), 6) AS q2,
             round(quantile_cont(value, 0.3), 6) AS q3,
             round(quantile_cont(value, 0.4), 6) AS q4,
             round(quantile_cont(value, 0.5), 6) AS q5,
             round(quantile_cont(value, 0.6), 6) AS q6,
             round(quantile_cont(value, 0.7), 6) AS q7,
             round(quantile_cont(value, 0.8), 6) AS q8,
             round(quantile_cont(value, 0.9), 6) AS q9
      FROM s
    ),
    d AS (
      SELECT CASE WHEN value > q9 THEN 9 WHEN value > q8 THEN 8
                  WHEN value > q7 THEN 7 WHEN value > q6 THEN 6
                  WHEN value > q5 THEN 5 WHEN value > q4 THEN 4
                  WHEN value > q3 THEN 3 WHEN value > q2 THEN 2
                  WHEN value > q1 THEN 1 ELSE 0 END AS decile,
             wk
      FROM s, e
    ),
    c AS (
      SELECT decile, sum(wk) * 1.0 AS nk, sum(1 - wk) * 1.0 AS nd
      FROM d GROUP BY 1
    ),
    t AS (SELECT sum(nk) AS tk, sum(nd) AS td FROM c)
    SELECT round(sum(sqrt((nk / tk) * (nd / td))), 6) AS bhattacharyya,
           round(sqrt(greatest(
               1.0 - sum(sqrt((nk / tk) * (nd / td))), 0.0)), 6)
               AS hellinger
    FROM c, t
"""


def q_daily_revenue_jarque_bera(sf_dir: str):
    """Jarque-Bera normality screen on daily revenue: sample skewness
    g1 = m3/m2^1.5, excess kurtosis g2 = m4/m2² − 3 from the central
    moments, and JB = n/6·(g1² + g2²/4) — the one-row gate a forecasting
    pipeline runs before assuming Gaussian errors.  The order stream
    collapses to one exact-integer-cents row per day via the combiner
    exchange; moments finalize over the tiny series.  JB folds the
    ROUNDED g1/g2 so the composite is deterministic on both sides."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "skewness": pa.array([], pa.float64()),
            "ex_kurtosis": pa.array([], pa.float64()),
            "jb_stat": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = float(len(c))
        mu = c.sum() / n
        e = c - mu
        m2 = (e * e).sum() / n
        if m2 <= 0.0:
            return empty
        g1 = ((e * e * e).sum() / n) / m2 ** 1.5
        g2 = ((e * e * e * e).sum() / n) / (m2 * m2) - 3.0
        g1r = float(np.round(g1, 6))
        g2r = float(np.round(g2, 6))
        jb = n / 6.0 * (g1r * g1r + g2r * g2r / 4.0)
        out = pa.table({
            "n_days": pa.array([int(n)], pa.int64()),
            "skewness": pa.array([g1], pa.float64()),
            "ex_kurtosis": pa.array([g2], pa.float64()),
            "jb_stat": pa.array([jb], pa.float64()),
        })
        for name in ("skewness", "ex_kurtosis", "jb_stat"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "skewness", "ex_kurtosis",
                            "jb_stat"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_jarque_bera"] = q_daily_revenue_jarque_bera
ORACLE_SQL["q_daily_revenue_jarque_bera"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    m AS (SELECT sum(c) / count(*) AS mu, count(*) * 1.0 AS n FROM d),
    e AS (SELECT c - mu AS e, n FROM d, m),
    mm AS (
      SELECT any_value(n) AS n,
             sum(e * e) / any_value(n) AS m2,
             sum(e * e * e) / any_value(n) AS m3,
             sum(e * e * e * e) / any_value(n) AS m4
      FROM e
    ),
    g AS (
      SELECT n,
             round(m3 / pow(m2, 1.5), 6) AS g1,
             round(m4 / (m2 * m2) - 3.0, 6) AS g2
      FROM mm
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           g1 AS skewness,
           g2 AS ex_kurtosis,
           round(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) AS jb_stat
    FROM g
"""


def q_daily_revenue_ljung_box(sf_dir: str):
    """Ljung-Box portmanteau test on daily revenue, lags 1..7: per-lag
    autocorrelation ρ_k of the mean-centered series (row-order lag over
    the day-sorted table) and the cumulative Q(k) = n(n+2)·Σ_{j≤k}
    ρ_j²/(n−j) — the residual-whiteness check behind every forecast
    model.  One combiner exchange to the tiny daily table; Q folds the
    ROUNDED ρ so the composite is deterministic on both sides."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "lag": pa.array([], pa.int64()),
            "rho": pa.array([], pa.float64()),
            "q_lb": pa.array([], pa.float64()),
        })
        if t.num_rows < 9:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = float(len(c))
        e = c - c.sum() / n
        s0 = (e * e).sum()
        if s0 <= 0.0:
            return empty
        lags, rhos, qs = [], [], []
        acc = 0.0
        for k in range(1, 8):
            rho = float(np.round((e[k:] * e[:-k]).sum() / s0, 6))
            acc += rho * rho / (n - k)
            lags.append(k)
            rhos.append(rho)
            qs.append(float(np.round(n * (n + 2.0) * acc, 6)))
        return pa.table({
            "lag": pa.array(lags, pa.int64()),
            "rho": pa.array(rhos, pa.float64()),
            "q_lb": pa.array(qs, pa.float64()),
        })

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["lag", "rho", "q_lb"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_ljung_box"] = q_daily_revenue_ljung_box
ORACLE_SQL["q_daily_revenue_ljung_box"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    m AS (SELECT sum(c) / count(*) AS mu, count(*) * 1.0 AS n FROM d),
    o AS (
      SELECT c - mu AS e, row_number() OVER (ORDER BY day) AS rn, n
      FROM d, m
    ),
    den AS (SELECT sum(e * e) AS s0, any_value(n) AS n FROM o),
    r AS (
      SELECT k.k AS lag,
             round(sum(a.e * b.e) / any_value(den.s0), 6) AS rho,
             any_value(den.n) AS n
      FROM generate_series(1, 7) k(k)
      JOIN o a ON TRUE
      JOIN o b ON b.rn = a.rn + k.k, den
      GROUP BY 1
    )
    SELECT lag, rho,
           round(n * (n + 2.0) * sum(rho * rho / (n - lag))
                 OVER (ORDER BY lag), 6) AS q_lb
    FROM r
    ORDER BY lag
"""


def q_daily_revenue_dickey_fuller(sf_dir: str):
    """Dickey-Fuller unit-root screen on daily revenue: OLS of Δy_t on
    y_{t−1} with intercept over the day-sorted series; reports the mean-
    reversion coefficient φ and its t-statistic (the DF test stat) — the
    stationarity gate before differencing/detrending a series.  One
    combiner exchange to the tiny daily table; the regression finalizes
    with centered sums matching DuckDB's regr_* tree."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_obs": pa.array([], pa.int64()),
            "phi": pa.array([], pa.float64()),
            "t_stat": pa.array([], pa.float64()),
        })
        if t.num_rows < 4:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        x = c[:-1]
        y = c[1:] - c[:-1]
        n = float(len(x))
        ex = x - x.sum() / n
        ey = y - y.sum() / n
        sxx = (ex * ex).sum()
        sxy = (ex * ey).sum()
        syy = (ey * ey).sum()
        if sxx <= 0.0 or n <= 2.0:
            return empty
        phi = sxy / sxx
        sse = syy - sxy * sxy / sxx
        se = np.sqrt((sse / (n - 2.0)) / sxx)
        tstat = phi / se if se > 0.0 else None
        out = pa.table({
            "n_obs": pa.array([int(n)], pa.int64()),
            "phi": pa.array([phi], pa.float64()),
            "t_stat": pa.array([tstat], pa.float64()),
        })
        for name in ("phi", "t_stat"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_obs", "phi", "t_stat"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_dickey_fuller"] = q_daily_revenue_dickey_fuller
ORACLE_SQL["q_daily_revenue_dickey_fuller"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT lag(c) OVER (ORDER BY day) AS x,
             c - lag(c) OVER (ORDER BY day) AS y
      FROM d
    ),
    q AS (SELECT x * 1.0 AS x, y * 1.0 AS y FROM p WHERE x IS NOT NULL),
    s AS (
      SELECT count(*) * 1.0 AS n,
             regr_sxx(y, x) AS sxx,
             regr_sxy(y, x) AS sxy,
             regr_syy(y, x) AS syy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(sxy / sxx, 6) AS phi,
           round((sxy / sxx)
                 / sqrt(((syy - sxy * sxy / sxx) / (n - 2.0)) / sxx), 6)
               AS t_stat
    FROM s
"""


def q_daily_revenue_perm_entropy(sf_dir: str):
    """Permutation entropy (order 3) of daily revenue: each consecutive
    triple maps to its ordinal pattern via the 3-bit comparison code
    (x₁>x₀, x₂>x₀, x₂>x₁ — ties fall to 'not greater' identically on
    both sides), and the Shannon entropy of the pattern distribution —
    ≈ln 6 for white noise, lower for trending/periodic structure.  The
    per-pattern counts are exact integers; entropy folds the exact
    rationals n/total."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_triples": pa.array([], pa.int64()),
            "perm_entropy": pa.array([], pa.float64()),
            "perm_entropy_norm": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False)
        x0, x1, x2 = c[:-2], c[1:-1], c[2:]
        code = ((x1 > x0).astype(np.int64)
                + 2 * (x2 > x0).astype(np.int64)
                + 4 * (x2 > x1).astype(np.int64))
        cnt = np.bincount(code, minlength=8).astype(np.float64)
        total = cnt.sum()
        p = cnt[cnt > 0.0] / total
        h = float(-(p * np.log(p)).sum())
        out = pa.table({
            "n_triples": pa.array([int(total)], pa.int64()),
            "perm_entropy": pa.array([h], pa.float64()),
            "perm_entropy_norm": pa.array([h / np.log(6.0)], pa.float64()),
        })
        for name in ("perm_entropy", "perm_entropy_norm"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_triples", "perm_entropy",
                            "perm_entropy_norm"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_perm_entropy"] = q_daily_revenue_perm_entropy
ORACLE_SQL["q_daily_revenue_perm_entropy"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT c AS x0,
             lead(c, 1) OVER (ORDER BY day) AS x1,
             lead(c, 2) OVER (ORDER BY day) AS x2
      FROM d
    ),
    t AS (
      SELECT (CASE WHEN x1 > x0 THEN 1 ELSE 0 END
              + 2 * CASE WHEN x2 > x0 THEN 1 ELSE 0 END
              + 4 * CASE WHEN x2 > x1 THEN 1 ELSE 0 END) AS code
      FROM w WHERE x2 IS NOT NULL
    ),
    c AS (SELECT code, count(*) AS n FROM t GROUP BY 1),
    tot AS (SELECT sum(n) * 1.0 AS total FROM c),
    h AS (
      SELECT any_value(total) AS total,
             -sum((n / total) * ln(n / total)) AS h
      FROM c, tot
    )
    SELECT CAST(total AS BIGINT) AS n_triples,
           round(h, 6) AS perm_entropy,
           round(h / ln(6.0), 6) AS perm_entropy_norm
    FROM h
"""


def q_user_lifetime_rmst(sf_dir: str):
    """Restricted mean survival time at 7/14/28-day horizons — the
    scalar summary of the Kaplan-Meier curve (expected active days per
    user within the horizon) that product teams track release-over-
    release.  Uses the step-integral identity RMST(τ) = τ − Σ_{tᵢ≤τ}
    (τ−tᵢ)·(S(tᵢ₋₁)−S(tᵢ)): the per-time survival DROP needs only the
    inclusive and exclusive ln-survival prefix sums (same `range_sort` +
    `global_prefix_sums` machinery as q_user_lifetime_km), and each
    horizon is then ONE conditional scalar aggregate — no lead/lag,
    no second pass."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_prefix_sums

    s, total = _user_lifetime_death_table(sf_dir)
    taus = (7, 14, 28)

    def factor(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("d_events"), pa.float64())
        n = pc.subtract(pa.scalar(total, pa.float64()),
                        b.column("__before"))
        f = pc.subtract(pa.scalar(1.0, pa.float64()), pc.divide(d, n))
        lnf = pc.if_else(pc.greater(f, pa.scalar(0.0, pa.float64())),
                         pc.ln(pc.max_element_wise(
                             f, pa.scalar(1e-300, pa.float64()))),
                         pa.scalar(0.0, pa.float64()))
        return pa.table({"days": b.column("days"), "__f": f,
                         "__lnf": lnf})

    s2 = s.map_batches(factor, batch_format="pyarrow")
    s2 = global_prefix_sums(s2, "__lnf", out_name="__lnsum",
                            exclusive=False)
    s2 = global_prefix_sums(s2, "__lnf", out_name="__lnprev",
                            exclusive=True)

    def weights(b: pa.Table) -> pa.Table:
        prev = pc.exp(b.column("__lnprev"))
        cur = pc.if_else(
            pc.equal(b.column("__f"), pa.scalar(0.0, pa.float64())),
            pa.scalar(0.0, pa.float64()),
            pc.exp(b.column("__lnsum")))
        drop = pc.subtract(prev, cur)
        days = pc.cast(b.column("days"), pa.float64())
        cols = {}
        for tau in taus:
            ft = pa.scalar(float(tau), pa.float64())
            cols[f"w{tau}"] = pc.if_else(
                pc.less_equal(days, ft),
                pc.multiply(pc.subtract(ft, days), drop),
                pa.scalar(0.0, pa.float64()))
        return _add_g(pa.table(cols))

    g = grouped_agg(s2.map_batches(weights, batch_format="pyarrow"),
                    ["__g"], [(f"s{tau}", f"w{tau}", "sum")
                              for tau in taus])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "horizon_days": pa.array([], pa.int64()),
            "rmst": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        out = pa.table({
            "horizon_days": pa.array(list(taus), pa.int64()),
            "rmst": pa.array([float(tau) - float(r[f"s{tau}"])
                              for tau in taus], pa.float64()),
        })
        idx = out.column_names.index("rmst")
        return out.set_column(idx, "rmst",
                              round_like_duckdb(out.column("rmst"), 6))

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["horizon_days", "rmst"]),
        batch_format="pyarrow")


QUERIES["q_user_lifetime_rmst"] = q_user_lifetime_rmst
ORACLE_SQL["q_user_lifetime_rmst"] = """
    WITH l AS (
        SELECT user_id,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                    // 86400000000 AS BIGINT) AS days
        FROM events GROUP BY user_id
    ),
    t AS (SELECT count(*) * 1.0 AS total FROM l),
    d AS (SELECT days, count(*) AS d_events FROM l GROUP BY days),
    c AS (
        SELECT days, d_events,
               (SELECT total FROM t)
                   - coalesce(sum(d_events) OVER (ORDER BY days
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
        FROM d
    ),
    f AS (
        SELECT days, 1.0 - d_events * 1.0 / n AS f
        FROM c
    ),
    s AS (
        SELECT days,
               coalesce(exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0 END)
                            OVER (ORDER BY days
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)), 1.0) AS prev,
               CASE WHEN f = 0 THEN 0.0
                    ELSE exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0 END)
                             OVER (ORDER BY days))
               END AS cur
        FROM f
    )
    SELECT tau.tau AS horizon_days,
           round(tau.tau - sum(CASE WHEN days <= tau.tau
                                    THEN (tau.tau - days) * (prev - cur)
                                    ELSE 0.0 END), 6) AS rmst
    FROM (VALUES (7), (14), (28)) tau(tau) CROSS JOIN s
    GROUP BY tau.tau
    ORDER BY 1
"""


def q_purchase_avg_precision(sf_dir: str):
    """Average precision (area under the precision-recall curve, step
    interpolation) of event value as a purchase classifier — the
    class-imbalance-robust companion to q_purchase_value_auc.  Ties are
    handled by DISTINCT-score groups: after one per-value aggregate
    (n, true positives), the score-descending cumulative counts ride
    `range_sort` + `global_prefix_sums`, and AP = Σ tpᵥ·(cumTP/cumN) /
    totalTP is one scalar fold — no per-row ranking."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        return pa.table({
            "value": b.column("value"),
            "y": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
        })

    g = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                    ["value"], [("n", "y", "count"), ("tp", "y", "sum")])
    s = range_sort(g, "value", descending=True)
    s = global_prefix_sums(s, "n", out_name="__cn", exclusive=False)
    s = global_prefix_sums(s, "tp", out_name="__ctp", exclusive=False)

    def term(b: pa.Table) -> pa.Table:
        tp = pc.cast(b.column("tp"), pa.float64())
        prec = pc.divide(
            pc.multiply(pc.cast(b.column("__ctp"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pc.cast(b.column("__cn"), pa.float64()))
        return _add_g(pa.table({
            "term": pc.multiply(tp, prec),
            "tp": b.column("tp"),
        }))

    t = grouped_agg(s.map_batches(term, batch_format="pyarrow"), ["__g"],
                    [("s_term", "term", "sum"), ("n_pos", "tp", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_pos": pa.array([], pa.int64()),
            "avg_precision": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        npos = int(r["n_pos"])
        if npos == 0:
            return empty
        out = pa.table({
            "n_pos": pa.array([npos], pa.int64()),
            "avg_precision": pa.array([float(r["s_term"]) / npos],
                                      pa.float64()),
        })
        idx = out.column_names.index("avg_precision")
        return out.set_column(
            idx, "avg_precision",
            round_like_duckdb(out.column("avg_precision"), 6))

    out = grouped_map(t, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_pos", "avg_precision"]),
        batch_format="pyarrow")


QUERIES["q_purchase_avg_precision"] = q_purchase_avg_precision
ORACLE_SQL["q_purchase_avg_precision"] = """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT value, count(*) AS n, sum(y) AS tp FROM s GROUP BY value),
    c AS (
      SELECT tp, sum(n) OVER (ORDER BY value DESC) AS cn,
             sum(tp) OVER (ORDER BY value DESC) AS ctp
      FROM g
    )
    SELECT CAST(sum(tp) AS BIGINT) AS n_pos,
           round(sum(tp * (ctp * 1.0 / cn)) / sum(tp), 6) AS avg_precision
    FROM c
"""


def q_purchase_threshold_metrics(sf_dir: str):
    """Classifier scorecard at one operating point: predicting
    'purchase' when event value exceeds the global median yields a 2×2
    confusion matrix and the derived precision / recall / F1 / accuracy /
    balanced accuracy / Matthews correlation — the deploy-gate numbers
    next to the threshold-free AUC/AP.  The threshold is one exact
    global quantile; the confusion cells are ONE combiner fold of exact
    integers, so every derived metric is bitwise deterministic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    ev = _read(sf_dir, "events", ["event_type", "value"])
    vals = ev.map_batches(
        lambda b: b.select(["value"]).filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")
    thr = global_exact_quantiles(vals, "value", [("q", 0.5)],
                                 round_to=6)["q"]

    def cells(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        y = pc.cast(pc.equal(b.column("event_type"),
                             pa.scalar("purchase")), pa.int64())
        p = pc.cast(pc.greater(b.column("value"),
                               pa.scalar(thr, pa.float64())), pa.int64())
        one = pa.scalar(1, pa.int64())
        return _add_g(pa.table({
            "tp": pc.multiply(y, p),
            "fp": pc.multiply(pc.subtract(one, y), p),
            "fn": pc.multiply(y, pc.subtract(one, p)),
            "tn": pc.multiply(pc.subtract(one, y), pc.subtract(one, p)),
        }))

    g = grouped_agg(ev.map_batches(cells, batch_format="pyarrow"), ["__g"],
                    [("tp", "tp", "sum"), ("fp", "fp", "sum"),
                     ("fn", "fn", "sum"), ("tn", "tn", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "threshold": pa.array([], pa.float64()),
            "tp": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
            "fn": pa.array([], pa.int64()),
            "tn": pa.array([], pa.int64()),
            "precision": pa.array([], pa.float64()),
            "recall": pa.array([], pa.float64()),
            "f1": pa.array([], pa.float64()),
            "accuracy": pa.array([], pa.float64()),
            "balanced_accuracy": pa.array([], pa.float64()),
            "mcc": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        tp, fp = int(r["tp"]), int(r["fp"])
        fn, tn = int(r["fn"]), int(r["tn"])
        prec = tp * 1.0 / (tp + fp) if tp + fp > 0 else None
        rec = tp * 1.0 / (tp + fn) if tp + fn > 0 else None
        f1 = 2.0 * tp / (2.0 * tp + fp + fn) if 2 * tp + fp + fn > 0 else None
        acc = (tp + tn) * 1.0 / (tp + fp + fn + tn)
        bal = (((tp * 1.0 / (tp + fn)) + (tn * 1.0 / (tn + fp))) / 2.0
               if tp + fn > 0 and tn + fp > 0 else None)
        den = (((tp + fp) * 1.0) * (tp + fn) * (tn + fp) * (tn + fn))
        mcc = ((tp * tn - fp * fn) / np.sqrt(den)) if den > 0.0 else None
        out = pa.table({
            "threshold": pa.array([thr], pa.float64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "tn": pa.array([tn], pa.int64()),
            "precision": pa.array([prec], pa.float64()),
            "recall": pa.array([rec], pa.float64()),
            "f1": pa.array([f1], pa.float64()),
            "accuracy": pa.array([acc], pa.float64()),
            "balanced_accuracy": pa.array([bal], pa.float64()),
            "mcc": pa.array([mcc], pa.float64()),
        })
        for name in ("precision", "recall", "f1", "accuracy",
                     "balanced_accuracy", "mcc"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["threshold", "tp", "fp", "fn", "tn",
                            "precision", "recall", "f1", "accuracy",
                            "balanced_accuracy", "mcc"]),
        batch_format="pyarrow")


QUERIES["q_purchase_threshold_metrics"] = q_purchase_threshold_metrics
ORACLE_SQL["q_purchase_threshold_metrics"] = """
    WITH thr AS (
      SELECT round(quantile_cont(value, 0.5), 6) AS thr
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN value > thr THEN 1 ELSE 0 END AS p
      FROM events, thr WHERE value IS NOT NULL
    ),
    c AS (
      SELECT any_value(thr.thr) AS threshold,
             sum(y * p) AS tp, sum((1 - y) * p) AS fp,
             sum(y * (1 - p)) AS fn, sum((1 - y) * (1 - p)) AS tn
      FROM s, thr
    )
    SELECT threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(tp * 1.0 / (tp + fp), 6) AS precision,
           round(tp * 1.0 / (tp + fn), 6) AS recall,
           round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
           round((tp + tn) * 1.0 / (tp + fp + fn + tn), 6) AS accuracy,
           round(((tp * 1.0 / (tp + fn)) + (tn * 1.0 / (tn + fp))) / 2.0,
                 6) AS balanced_accuracy,
           round((tp * tn - fp * fn)
                 / sqrt(((tp + fp) * 1.0) * (tp + fn) * (tn + fp)
                        * (tn + fn)), 6) AS mcc
    FROM c
"""


def q_supplier_adamic_adar(sf_dir: str):
    """Link-prediction scorecard on the bipartite supply graph, top-20
    supplier pairs by Adamic-Adar: AA = Σ_{shared part p} 1/ln(deg(p))
    (rare shared parts count more), alongside raw common-neighbor counts
    and preferential attachment deg(a)·deg(b) — the three classic neighbor-
    overlap scores next to q_supplier_jaccard_similarity.  Pairs emerge
    inside each part's co-partition run (weight 1/ln(run size) known on
    the spot — never a supplier×supplier join); AA folds on the combiner
    exchange; degrees broadcast back."""
    from ..stages.agg import _key_run_bounds, global_topk, grouped_agg, \
        grouped_map, round_like_duckdb

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    edges = grouped_agg(li, ["l_partkey", "l_suppkey"],
                        [("__n", "l_partkey", "count")])
    edges = edges.map_batches(
        lambda b: b.select(["l_partkey", "l_suppkey"]),
        batch_format="pyarrow").materialize()

    deg = grouped_agg(edges, ["l_suppkey"], [("deg", "l_suppkey", "count")],
                      sum_as_float=False)
    deg_a = deg.map_batches(
        lambda b: pa.table({"supp_a": b.column("l_suppkey"),
                            "deg_a": pc.cast(b.column("deg"), pa.int64())}),
        batch_format="pyarrow")
    deg_b = deg.map_batches(
        lambda b: pa.table({"supp_b": b.column("l_suppkey"),
                            "deg_b": pc.cast(b.column("deg"), pa.int64())}),
        batch_format="pyarrow")

    empty = pa.table({"supp_a": pa.array([], pa.int64()),
                      "supp_b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())})

    def pairs_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("l_partkey", "ascending"),
                       ("l_suppkey", "ascending")])
        bounds = _key_run_bounds(t, ["l_partkey"])
        sizes = np.diff(bounds)
        supps = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        a_out, b_out, w_out = [], [], []
        for ri in np.flatnonzero(sizes >= 2):
            s, e = int(bounds[ri]), int(bounds[ri + 1])
            ii, jj = np.triu_indices(e - s, k=1)
            a_out.append(supps[s:e][ii])
            b_out.append(supps[s:e][jj])
            w_out.append(np.full(len(ii), 1.0 / np.log(float(e - s))))
        if not a_out:
            return empty
        return pa.table({
            "supp_a": pa.array(np.concatenate(a_out), pa.int64()),
            "supp_b": pa.array(np.concatenate(b_out), pa.int64()),
            "w": pa.array(np.concatenate(w_out), pa.float64()),
        })

    pairs = grouped_map(
        edges, "l_partkey", pairs_part, per_group=False,
        empty_schema=pa.table({
            "l_partkey": pa.array([], pa.int64()),
            "l_suppkey": pa.array([], pa.int64())}))
    agg = grouped_agg(pairs, ["supp_a", "supp_b"],
                      [("n_common", "supp_a", "count"),
                       ("aa", "w", "sum")])
    j = broadcast_join(agg, deg_a, left_key="supp_a",
                       right_key="supp_a", columns=["deg_a"])
    j = broadcast_join(j, deg_b, left_key="supp_b",
                       right_key="supp_b", columns=["deg_b"])

    def score(b: pa.Table) -> pa.Table:
        if "n_common" not in b.column_names:
            return pa.table({"supp_a": pa.array([], pa.int64()),
                             "supp_b": pa.array([], pa.int64()),
                             "n_common": pa.array([], pa.int64()),
                             "adamic_adar": pa.array([], pa.float64()),
                             "pref_attach": pa.array([], pa.int64())})
        return pa.table({
            "supp_a": b.column("supp_a"),
            "supp_b": b.column("supp_b"),
            "n_common": pc.cast(b.column("n_common"), pa.int64()),
            "adamic_adar": round_like_duckdb(b.column("aa"), 6),
            "pref_attach": pc.multiply(b.column("deg_a"),
                                       b.column("deg_b")),
        })

    scored = j.map_batches(score, batch_format="pyarrow")
    return global_topk(scored, ["adamic_adar", "supp_a", "supp_b"], 20,
                       descending=[True, False, False])


QUERIES["q_supplier_adamic_adar"] = q_supplier_adamic_adar
ORACLE_SQL["q_supplier_adamic_adar"] = """
    WITH e AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    pd AS (SELECT l_partkey, count(*) AS pdeg FROM e GROUP BY 1),
    d AS (SELECT l_suppkey, count(*) AS deg FROM e GROUP BY 1),
    i AS (
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
             count(*) AS n_common,
             sum(1.0 / ln(pd.pdeg)) AS aa
      FROM e a
      JOIN e b ON a.l_partkey = b.l_partkey
              AND b.l_suppkey > a.l_suppkey
      JOIN pd ON pd.l_partkey = a.l_partkey
      GROUP BY 1, 2
    )
    SELECT supp_a, supp_b, n_common,
           round(aa, 6) AS adamic_adar,
           CAST(da.deg * db.deg AS BIGINT) AS pref_attach
    FROM i JOIN d da ON da.l_suppkey = supp_a
           JOIN d db ON db.l_suppkey = supp_b
    ORDER BY adamic_adar DESC, supp_a, supp_b LIMIT 20
"""


def _embedding_label_moments(sf_dir: str):
    """Shared preamble of the clustering-validity indices: the embedding
    table exploded to (label, dim) cells with per-cell count, sum, and
    sum-of-squares — |labels|×64 rows off one combiner exchange; the
    exchange never sees raw vectors."""
    from ..stages.agg import grouped_agg

    emb = _read(sf_dir, "embeddings", ["label", "embedding"])

    def explode(b: pa.Table) -> pa.Table:
        vecs = b.column("embedding")
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        lens = pc.list_value_length(vecs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.cast(vecs.flatten(), pa.float64()).to_numpy(
            zero_copy_only=False)
        labels = b.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64)
        dims = (np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1],
                            lens))
        return pa.table({
            "label": pa.array(np.repeat(labels, lens), pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "v": pa.array(flat, pa.float64()),
            "vv": pa.array(flat * flat, pa.float64()),
        })

    return grouped_agg(emb.map_batches(explode, batch_format="pyarrow"),
                       ["label", "dim"],
                       [("n", "v", "count"), ("s", "v", "sum"),
                        ("ssq", "vv", "sum")])


def q_embedding_calinski_harabasz(sf_dir: str):
    """Calinski-Harabasz (variance-ratio) clustering validity of the
    label partition over the embeddings: CH = (B/(k−1)) / (W/(n−k)) with
    between-scatter B = Σ_j n_j‖c_j−c‖² and within-scatter W = Σ_j Σ_x
    ‖x−c_j‖² — higher means tighter, better-separated classes.  Both
    scatters come dim-wise off the shared (label, dim) moment cells; raw
    vectors never shuffle."""
    from ..stages.agg import grouped_map, round_like_duckdb

    g = _embedding_label_moments(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_vectors": pa.array([], pa.int64()),
            "n_labels": pa.array([], pa.int64()),
            "between_ss": pa.array([], pa.float64()),
            "within_ss": pa.array([], pa.float64()),
            "calinski_harabasz": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        lab = t.column("label").to_numpy(zero_copy_only=False)
        dim = t.column("dim").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ssq = t.column("ssq").to_numpy(zero_copy_only=False)
        labels = np.unique(lab)
        k = len(labels)
        nvec = int(n[dim == dim.min()].sum())
        if k < 2 or nvec <= k:
            return empty
        w = float((ssq - s * s / n).sum())
        # per-dim grand centroid over the same cells
        b_tot = 0.0
        for dd in np.unique(dim):
            m = dim == dd
            gc = s[m].sum() / n[m].sum()
            cj = s[m] / n[m]
            b_tot += float((n[m] * (cj - gc) * (cj - gc)).sum())
        ch = (b_tot / (k - 1.0)) / (w / (nvec - float(k)))
        out = pa.table({
            "n_vectors": pa.array([nvec], pa.int64()),
            "n_labels": pa.array([int(k)], pa.int64()),
            "between_ss": pa.array([b_tot], pa.float64()),
            "within_ss": pa.array([w], pa.float64()),
            "calinski_harabasz": pa.array([ch], pa.float64()),
        })
        for name in ("between_ss", "within_ss", "calinski_harabasz"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_vectors", "n_labels", "between_ss",
                            "within_ss", "calinski_harabasz"]),
        batch_format="pyarrow")


QUERIES["q_embedding_calinski_harabasz"] = q_embedding_calinski_harabasz
ORACLE_SQL["q_embedding_calinski_harabasz"] = """
    WITH x AS (
      SELECT label, gs.i AS dim, CAST(embedding[gs.i + 1] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN range(64) AS gs(i)
      WHERE gs.i < len(embedding)
    ),
    pl AS (
      SELECT label, dim, count(*) AS n, sum(v) AS s, sum(v * v) AS ssq
      FROM x GROUP BY 1, 2
    ),
    w AS (SELECT sum(ssq - s * s / n) AS w FROM pl),
    gc AS (SELECT dim, sum(s) / sum(n) AS gc FROM pl GROUP BY 1),
    b AS (
      SELECT sum(pl.n * (pl.s / pl.n - gc.gc) * (pl.s / pl.n - gc.gc))
          AS b
      FROM pl JOIN gc ON gc.dim = pl.dim
    ),
    kk AS (
      SELECT count(DISTINCT label) * 1.0 AS k,
             count(*) * 1.0 AS nvec
      FROM embeddings
    )
    SELECT CAST(nvec AS BIGINT) AS n_vectors,
           CAST(k AS BIGINT) AS n_labels,
           round(b, 6) AS between_ss,
           round(w, 6) AS within_ss,
           round((b / (k - 1.0)) / (w / (nvec - k)), 6)
               AS calinski_harabasz
    FROM w, b, kk
"""


def q_embedding_davies_bouldin(sf_dir: str):
    """Davies-Bouldin clustering validity of the label partition:
    per-cluster dispersion S_j = √(W_j/n_j), pairwise centroid
    separation M_ij, and DB = mean_i max_{j≠i} (S_i+S_j)/M_ij — lower is
    better; the standard k-selection companion to Calinski-Harabasz.
    All inputs come off the shared (label, dim) moment cells (k×64
    rows); the k×k pair fold is driver-trivial."""
    from ..stages.agg import grouped_map, round_like_duckdb

    g = _embedding_label_moments(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_labels": pa.array([], pa.int64()),
            "davies_bouldin": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("label", "ascending"), ("dim", "ascending")])
        lab = t.column("label").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ssq = t.column("ssq").to_numpy(zero_copy_only=False)
        labels = np.unique(lab)
        k = len(labels)
        if k < 2:
            return empty
        d = len(np.unique(t.column("dim").to_numpy(zero_copy_only=False)))
        cent = (s / n).reshape(k, d)
        wj = (ssq - s * s / n).reshape(k, d).sum(axis=1)
        nj = n.reshape(k, d)[:, 0]
        sj = np.sqrt(wj / nj)
        diff = cent[:, None, :] - cent[None, :, :]
        m = np.sqrt((diff * diff).sum(axis=2))
        r = (sj[:, None] + sj[None, :]) / np.where(m > 0.0, m, np.inf)
        np.fill_diagonal(r, -np.inf)
        db = float(np.max(r, axis=1).sum() / k)
        out = pa.table({
            "n_labels": pa.array([int(k)], pa.int64()),
            "davies_bouldin": pa.array([db], pa.float64()),
        })
        idx = out.column_names.index("davies_bouldin")
        return out.set_column(
            idx, "davies_bouldin",
            round_like_duckdb(out.column("davies_bouldin"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_labels", "davies_bouldin"]),
        batch_format="pyarrow")


QUERIES["q_embedding_davies_bouldin"] = q_embedding_davies_bouldin
ORACLE_SQL["q_embedding_davies_bouldin"] = """
    WITH x AS (
      SELECT label, gs.i AS dim, CAST(embedding[gs.i + 1] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN range(64) AS gs(i)
      WHERE gs.i < len(embedding)
    ),
    pl AS (
      SELECT label, dim, count(*) AS n, sum(v) AS s, sum(v * v) AS ssq
      FROM x GROUP BY 1, 2
    ),
    cents AS (SELECT label, dim, s / n AS c FROM pl),
    sj AS (
      SELECT label, sqrt(sum(ssq - s * s / n) / max(n)) AS sj
      FROM pl GROUP BY label
    ),
    m AS (
      SELECT a.label AS la, b.label AS lb,
             sqrt(sum((a.c - b.c) * (a.c - b.c))) AS m
      FROM cents a JOIN cents b
        ON a.dim = b.dim AND a.label <> b.label
      GROUP BY 1, 2
    ),
    r AS (
      SELECT la, max((sa.sj + sb.sj) / m.m) AS rmax
      FROM m JOIN sj sa ON sa.label = la
             JOIN sj sb ON sb.label = lb
      WHERE m.m > 0
      GROUP BY la
    )
    SELECT CAST(count(*) AS BIGINT) AS n_labels,
           round(sum(rmax) / count(*), 6) AS davies_bouldin
    FROM r
"""


def q_embedding_retrieval_metrics(sf_dir: str):
    """Retrieval-eval scorecard over the embedding space, leave-one-out:
    for every vector, rank its top-10 cosine neighbors and score the
    ranking against 'same label' relevance — MRR@10 (reciprocal rank of
    the first same-label hit, 0 if none) and binary NDCG@10 (DCG over
    hits at 1/log₂(rank+1), ideal = the class-size-capped prefix).  One
    data pass: the id+matrix broadcast once, one matmul per batch,
    per-query top-11 merge (self dropped), ranks assigned inside each
    query's co-partition run, labels broadcast back — no n×n shuffle."""
    import ray

    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        grouped_topk, round_like_duckdb
    from ..stages.ann import _stack, cosine_topk_multi

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    tabs = [t for t in ray.get(emb.to_arrow_refs()) if t.num_columns > 0]
    full = pa.concat_tables(tabs)
    ids = full.column("vec_id").to_numpy(zero_copy_only=False).astype(
        np.int64)

    res = cosine_topk_multi(emb, _stack(full), k=11, query_ids=ids,
                            round_to=4)
    noself = res.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("query_id"),
                                        b.column("vec_id"))),
        batch_format="pyarrow",
    )

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64())})

    def rank_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("query_id", "ascending"), ("sim", "descending"),
                       ("vec_id", "ascending")])
        bounds = _key_run_bounds(t, ["query_id"])
        sizes = np.diff(bounds)
        rnk = (np.arange(t.num_rows, dtype=np.int64)
               - np.repeat(bounds[:-1], sizes)) + 1
        keep = rnk <= 10
        return pa.table({
            "query_id": t.column("query_id").filter(pa.array(keep)),
            "vec_id": t.column("vec_id").filter(pa.array(keep)),
            "rnk": pa.array(rnk[keep], pa.int64()),
        })

    ranked = grouped_map(noself, "query_id", rank_part, per_group=False,
                         empty_schema=pa.table({
                             "query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())}))

    labels = emb.map_batches(
        lambda b: b.select(["vec_id", "label"]), batch_format="pyarrow")
    qlab = labels.map_batches(
        lambda b: pa.table({"query_id": b.column("vec_id"),
                            "q_label": b.column("label")}),
        batch_format="pyarrow")
    nlab = labels.map_batches(
        lambda b: pa.table({"vec_id": b.column("vec_id"),
                            "n_label": b.column("label")}),
        batch_format="pyarrow")
    j = broadcast_join(ranked, qlab, left_key="query_id",
                       right_key="query_id", columns=["q_label"])
    j = broadcast_join(j, nlab, left_key="vec_id", columns=["n_label"])

    def scores(b: pa.Table) -> pa.Table:
        match = pc.cast(pc.equal(b.column("q_label"), b.column("n_label")),
                        pa.int64())
        rnk = pc.cast(b.column("rnk"), pa.float64())
        dcg = pc.if_else(
            pc.equal(match, pa.scalar(1, pa.int64())),
            pc.divide(pa.scalar(1.0, pa.float64()),
                      pc.log2(pc.add(rnk, pa.scalar(1.0, pa.float64())))),
            pa.scalar(0.0, pa.float64()))
        fr = pc.if_else(pc.equal(match, pa.scalar(1, pa.int64())),
                        b.column("rnk"),
                        pa.scalar(10**9, pa.int64()))
        return pa.table({
            "query_id": b.column("query_id"),
            "q_label": b.column("q_label"),
            "dcg_t": dcg,
            "fr": fr,
        })

    per_q = grouped_agg(j.map_batches(scores, batch_format="pyarrow"),
                        ["query_id", "q_label"],
                        [("dcg", "dcg_t", "sum"), ("fr", "fr", "min")])

    # class sizes for the ideal DCG (tiny per-label table, broadcast)
    cs = grouped_agg(labels, ["label"], [("m", "vec_id", "count")],
                     sum_as_float=False)
    cs = cs.map_batches(
        lambda b: pa.table({"q_label": b.column("label"),
                            "m": pc.cast(b.column("m"), pa.int64())}),
        batch_format="pyarrow")
    per_q = broadcast_join(per_q, cs, left_key="q_label",
                           right_key="q_label", columns=["m"])

    idcg_cum = np.cumsum(1.0 / np.log2(np.arange(2, 12, dtype=np.float64)))

    def per_query(b: pa.Table) -> pa.Table:
        fr = b.column("fr").to_numpy(zero_copy_only=False)
        rr = np.where(fr <= 10, 1.0 / fr.astype(np.float64), 0.0)
        m = b.column("m").to_numpy(zero_copy_only=False)
        dcg = b.column("dcg").to_numpy(zero_copy_only=False)
        kk = np.minimum(10, m - 1)
        has = kk >= 1
        ndcg = np.where(has, dcg / idcg_cum[np.clip(kk, 1, 10) - 1], 0.0)
        return _add_g(pa.table({
            "rr": pa.array(rr, pa.float64()),
            "ndcg": pa.array(ndcg, pa.float64()),
            "has": pa.array(has.astype(np.int64), pa.int64()),
        }))

    g = grouped_agg(per_q.map_batches(per_query, batch_format="pyarrow"),
                    ["__g"], [("n_q", "rr", "count"), ("s_rr", "rr", "sum"),
                              ("s_ndcg", "ndcg", "sum"),
                              ("n_has", "has", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_queries": pa.array([], pa.int64()),
            "mrr": pa.array([], pa.float64()),
            "ndcg_10": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        nq, nh = int(r["n_q"]), int(r["n_has"])
        if nq == 0:
            return empty
        out = pa.table({
            "n_queries": pa.array([nq], pa.int64()),
            "mrr": pa.array([float(r["s_rr"]) / nq], pa.float64()),
            "ndcg_10": pa.array(
                [float(r["s_ndcg"]) / nh if nh > 0 else None],
                pa.float64()),
        })
        for name in ("mrr", "ndcg_10"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_queries", "mrr", "ndcg_10"]),
        batch_format="pyarrow")


QUERIES["q_embedding_retrieval_metrics"] = q_embedding_retrieval_metrics
ORACLE_SQL["q_embedding_retrieval_metrics"] = """
    WITH p AS (
      SELECT a.vec_id AS q, a.label AS ql, b.vec_id AS nid,
             b.label AS nl,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                   4) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    r AS (
      SELECT q, ql, nl, rn FROM (
        SELECT q, ql, nl,
               row_number() OVER (PARTITION BY q
                                  ORDER BY cos DESC, nid) AS rn
        FROM p
      ) WHERE rn <= 10
    ),
    a AS (
      SELECT q, any_value(ql) AS ql,
             min(CASE WHEN nl = ql THEN rn END) AS fr,
             sum(CASE WHEN nl = ql THEN 1.0 / log2(rn + 1.0)
                      ELSE 0.0 END) AS dcg
      FROM r GROUP BY q
    ),
    cs AS (SELECT label, count(*) AS m FROM embeddings GROUP BY label),
    w AS (
      SELECT gs.i + 1 AS rnk,
             sum(1.0 / log2(gs.i + 2.0)) OVER (ORDER BY gs.i) AS idcg
      FROM range(10) gs(i)
    ),
    j AS (
      SELECT a.q,
             CASE WHEN fr IS NOT NULL THEN 1.0 / fr ELSE 0.0 END AS rr,
             CASE WHEN cs.m > 1 THEN dcg / w.idcg END AS ndcg
      FROM a JOIN cs ON cs.label = a.ql
             LEFT JOIN w ON w.rnk = least(10, cs.m - 1)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(sum(rr) / count(*), 6) AS mrr,
           round(sum(ndcg) / count(ndcg), 6) AS ndcg_10
    FROM j
"""


def q_weekend_value_jsd(sf_dir: str):
    """Jensen-Shannon divergence between the weekday and weekend value
    distributions over shared global deciles — the symmetric, always-
    finite KL relative (in nats, ≤ ln 2) completing the distribution-
    distance family next to KS, PSI, and Hellinger.  Decile edges are
    exact global quantiles shared by both sides; the 10×2 share table
    folds exactly; 0·ln0 terms drop identically on both sides."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    labeled = _weekend_labeled_events(sf_dir)
    vals = labeled.map_batches(
        lambda b: b.select(["value"]).filter(
            pc.is_valid(b.column("value"))),
        batch_format="pyarrow")
    qs = global_exact_quantiles(
        vals, "value",
        [(f"q{i}", i / 10.0) for i in range(1, 10)], round_to=6)
    edges = np.array([qs[f"q{i}"] for i in range(1, 10)])

    def cells(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value").to_numpy(zero_copy_only=False)
        dec = np.searchsorted(edges, v, side="left")
        wkd = (b.column("variant").to_numpy(zero_copy_only=False)
               == "weekend").astype(np.int64)
        return pa.table({"decile": pa.array(dec.astype(np.int64)),
                         "wk": pa.array(wkd),
                         "wd": pa.array(1 - wkd)})

    g = grouped_agg(labeled.map_batches(cells, batch_format="pyarrow"),
                    ["decile"], [("nk", "wk", "sum"), ("nd", "wd", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "jsd": pa.array([], pa.float64()),
            "jsd_normalized": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("decile", "ascending")])
        nk = t.column("nk").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nd = t.column("nd").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tk, td = nk.sum(), nd.sum()
        if tk == 0.0 or td == 0.0:
            return empty
        p = nk / tk
        q = nd / td
        m = (p + q) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            kp = np.where(p > 0.0, p * np.log(p / m), 0.0)
            kq = np.where(q > 0.0, q * np.log(q / m), 0.0)
        jsd = float((kp.sum() + kq.sum()) / 2.0)
        out = pa.table({
            "jsd": pa.array([jsd], pa.float64()),
            "jsd_normalized": pa.array([jsd / np.log(2.0)], pa.float64()),
        })
        for name in ("jsd", "jsd_normalized"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["jsd", "jsd_normalized"]),
        batch_format="pyarrow")


QUERIES["q_weekend_value_jsd"] = q_weekend_value_jsd
ORACLE_SQL["q_weekend_value_jsd"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1 ELSE 0 END AS wk,
             value
      FROM events WHERE value IS NOT NULL
    ),
    e AS (
      SELECT round(quantile_cont(value, 0.1), 6) AS q1,
             round(quantile_cont(value, 0.2), 6) AS q2,
             round(quantile_cont(value, 0.3), 6) AS q3,
             round(quantile_cont(value, 0.4), 6) AS q4,
             round(quantile_cont(value, 0.5), 6) AS q5,
             round(quantile_cont(value, 0.6), 6) AS q6,
             round(quantile_cont(value, 0.7), 6) AS q7,
             round(quantile_cont(value, 0.8), 6) AS q8,
             round(quantile_cont(value, 0.9), 6) AS q9
      FROM s
    ),
    d AS (
      SELECT CASE WHEN value > q9 THEN 9 WHEN value > q8 THEN 8
                  WHEN value > q7 THEN 7 WHEN value > q6 THEN 6
                  WHEN value > q5 THEN 5 WHEN value > q4 THEN 4
                  WHEN value > q3 THEN 3 WHEN value > q2 THEN 2
                  WHEN value > q1 THEN 1 ELSE 0 END AS decile,
             wk
      FROM s, e
    ),
    c AS (
      SELECT decile, sum(wk) * 1.0 AS nk, sum(1 - wk) * 1.0 AS nd
      FROM d GROUP BY 1
    ),
    t AS (SELECT sum(nk) AS tk, sum(nd) AS td FROM c),
    z AS (
      SELECT nk / tk AS p, nd / td AS q,
             (nk / tk + nd / td) / 2.0 AS m
      FROM c, t
    ),
    h AS (
      SELECT (sum(CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END)
              + sum(CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END))
                 / 2.0 AS jsd
      FROM z
    )
    SELECT round(jsd, 6) AS jsd,
           round(jsd / ln(2.0), 6) AS jsd_normalized
    FROM h
"""


def q_customer_spend_lorenz(sf_dir: str):
    """Lorenz curve of customer lifetime spend: the cumulative spend
    share held by the poorest 10%, 20%, …, 90% of customers — the curve
    behind the Gini, read directly for "the bottom half of customers
    carry X% of revenue" statements.  Per-customer spend folds to exact
    integer cents; the curve rides `range_sort` (spend, custkey — a
    deterministic total order) + O(blocks) global row numbers + an exact
    integer prefix sum; only the 9 decile rows leave the pipeline."""
    from ..stages.agg import grouped_agg, round_like_duckdb
    from ..stages.sort import global_prefix_sums, global_row_numbers, \
        range_sort

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    spend = grouped_agg(orders.map_batches(cents, batch_format="pyarrow"),
                        ["o_custkey"], [("c", "c", "sum")],
                        sum_as_float=False)
    tot = _to_table(grouped_agg(
        spend.map_batches(_add_g, batch_format="pyarrow"), ["__g"],
        [("n", "c", "count"), ("tot", "c", "sum")]))
    if tot.num_rows == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "pct": pa.array([], pa.int64()),
            "cum_share": pa.array([], pa.float64())}))
    n = int(tot.column("n")[0].as_py())
    total = int(tot.column("tot")[0].as_py())

    s = range_sort(spend, "c", tiebreak=["o_custkey"])
    s = global_row_numbers(s, out_name="rn")
    s = global_prefix_sums(s, "c", out_name="cum", exclusive=False)
    targets = pa.array([n * k // 10 for k in range(1, 10)], pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("rn"), value_set=targets)
        b = b.filter(m)
        rn = b.column("rn").to_numpy(zero_copy_only=False)
        pct = np.searchsorted(targets.to_numpy(zero_copy_only=False),
                              rn, side="left") + 1
        share = pc.divide(
            pc.multiply(pc.cast(b.column("cum"), pa.float64()),
                        pa.scalar(1.0, pa.float64())),
            pa.scalar(float(total), pa.float64()))
        return pa.table({
            "pct": pa.array(pct * 10, pa.int64()),
            "cum_share": round_like_duckdb(share, 6),
        })

    return s.map_batches(pick, batch_format="pyarrow")


QUERIES["q_customer_spend_lorenz"] = q_customer_spend_lorenz
ORACLE_SQL["q_customer_spend_lorenz"] = """
    WITH s AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    t AS (SELECT count(*) AS n, sum(c) AS tot FROM s),
    r AS (
      SELECT c, o_custkey,
             row_number() OVER (ORDER BY c, o_custkey) AS rn,
             sum(c) OVER (ORDER BY c, o_custkey) AS cum
      FROM s
    )
    SELECT CAST(k.k * 10 AS BIGINT) AS pct,
           round(cum * 1.0 / tot, 6) AS cum_share
    FROM range(1, 10) k(k), t, r
    WHERE r.rn = (t.n * k.k) // 10
    ORDER BY pct
"""


def q_customer_spend_atkinson(sf_dir: str):
    """Atkinson inequality index (ε = 0.5) of customer lifetime spend:
    A = 1 − (mean√x)²/mean x — the welfare-weighted inequality measure
    whose value reads as "the share of total spend society would give up
    for perfect equality"; scale-invariant, so exact integer cents feed
    it directly.  One combiner fold (n, Σx, Σ√x); the index is a fixed
    three-term float tree."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    spend = grouped_agg(orders.map_batches(cents, batch_format="pyarrow"),
                        ["o_custkey"], [("c", "c", "sum")],
                        sum_as_float=False)

    def parts(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("c"), pa.float64())
        return _add_g(pa.table({"c": c, "sq": pc.sqrt(c)}))

    g = grouped_agg(spend.map_batches(parts, batch_format="pyarrow"),
                    ["__g"], [("n", "c", "count"), ("s", "c", "sum"),
                              ("ssq", "sq", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_customers": pa.array([], pa.int64()),
            "atkinson_05": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        n = float(r["n"])
        if n == 0.0 or float(r["s"]) <= 0.0:
            return empty
        ede = (float(r["ssq"]) / n) * (float(r["ssq"]) / n)
        a = 1.0 - ede / (float(r["s"]) / n)
        out = pa.table({
            "n_customers": pa.array([int(n)], pa.int64()),
            "atkinson_05": pa.array([a], pa.float64()),
        })
        idx = out.column_names.index("atkinson_05")
        return out.set_column(
            idx, "atkinson_05",
            round_like_duckdb(out.column("atkinson_05"), 6))

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_customers", "atkinson_05"]),
        batch_format="pyarrow")


QUERIES["q_customer_spend_atkinson"] = q_customer_spend_atkinson
ORACLE_SQL["q_customer_spend_atkinson"] = """
    WITH s AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT count(*) * 1.0 AS n, sum(c * 1.0) AS s,
             sum(sqrt(c * 1.0)) AS ssq
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(1.0 - ((ssq / n) * (ssq / n)) / (s / n), 6)
               AS atkinson_05
    FROM g
"""


def q_revenue_jackknife_ratio(sf_dir: str):
    """Leave-one-nation-out jackknife for the average order value
    (total revenue / total orders): point estimate, jackknife standard
    error √((k−1)/k·Σ(θ₍ᵢ₎−θ̄)²), and the ±1.96·SE interval — the
    grouped-resampling uncertainty estimate for a RATIO, where a naive
    per-order variance is wrong.  Per-nation totals are one combiner
    fold of exact cents; the k=|nations| leave-one-out sweep is
    driver-trivial."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    o = orders.map_batches(cents, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = broadcast_join(cust, nation, left_key="c_nationkey",
                          right_key="n_nationkey", columns=["n_name"])
    j = broadcast_join(o, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["n_name"])
    g = grouped_agg(j, ["n_name"], [("t", "c", "sum"),
                                    ("m", "c", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_groups": pa.array([], pa.int64()),
            "avg_order_value": pa.array([], pa.float64()),
            "jk_se": pa.array([], pa.float64()),
            "ci_lo": pa.array([], pa.float64()),
            "ci_hi": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        ti = t.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
        mi = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        tot, n = int(ti.sum()), int(mi.sum())
        k = float(len(ti))
        theta = tot * 1.0 / n / 100.0
        th_i = ((tot - ti) * 1.0 / (n - mi)) / 100.0
        jbar = th_i.sum() / k
        se = float(np.sqrt((k - 1.0) / k
                           * ((th_i - jbar) * (th_i - jbar)).sum()))
        out = pa.table({
            "n_groups": pa.array([int(k)], pa.int64()),
            "avg_order_value": pa.array([theta], pa.float64()),
            "jk_se": pa.array([se], pa.float64()),
            "ci_lo": pa.array([theta - 1.96 * se], pa.float64()),
            "ci_hi": pa.array([theta + 1.96 * se], pa.float64()),
        })
        for name in ("avg_order_value", "jk_se", "ci_lo", "ci_hi"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_groups", "avg_order_value", "jk_se",
                            "ci_lo", "ci_hi"]),
        batch_format="pyarrow")


QUERIES["q_revenue_jackknife_ratio"] = q_revenue_jackknife_ratio
ORACLE_SQL["q_revenue_jackknife_ratio"] = """
    WITH o AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS c
      FROM orders
    ),
    j AS (
      SELECT n_name, c
      FROM o JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey
    ),
    g AS (SELECT n_name, sum(c) AS t, count(*) AS m FROM j GROUP BY 1),
    tt AS (
      SELECT sum(t) AS tot, sum(m) AS n, count(*) * 1.0 AS k FROM g
    ),
    th AS (
      SELECT ((tot - t) * 1.0 / (n - m)) / 100.0 AS th_i,
             tot, n, k
      FROM g, tt
    ),
    s AS (
      SELECT any_value(k) AS k, any_value(tot) AS tot,
             any_value(n) AS n, sum(th_i) / any_value(k) AS jbar
      FROM th
    ),
    v AS (
      SELECT s.k AS k, s.tot AS tot, s.n AS n,
             sqrt((s.k - 1.0) / s.k
                  * sum((th.th_i - s.jbar) * (th.th_i - s.jbar))) AS se
      FROM th, s
      GROUP BY s.k, s.tot, s.n
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           round(tot * 1.0 / n / 100.0, 6) AS avg_order_value,
           round(se, 6) AS jk_se,
           round(tot * 1.0 / n / 100.0 - 1.96 * se, 6) AS ci_lo,
           round(tot * 1.0 / n / 100.0 + 1.96 * se, 6) AS ci_hi
    FROM v
"""


def q_doc_word_length_profile(sf_dir: str):
    """Word-length readability profile per language: average word
    length, share of long words (>6 chars, the LIX-style difficulty
    term), and share of short words (<4 chars) — the corpus-quality
    dashboard's per-source complexity screen (this synthetic corpus has
    no sentence punctuation, so the word-length terms are the
    well-defined part of a readability index).  Per-doc counts are fully
    vectorized (one split, one flat length pass, segmented bincounts);
    per-language sums ride the combiner and every ratio folds from
    exact integer totals."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        words = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(words)), words)
        longw = np.bincount(doc_idx[tlen > 6], minlength=len(words))
        shortw = np.bincount(doc_idx[tlen < 4], minlength=len(words))
        chars = np.bincount(doc_idx, weights=tlen.astype(np.float64),
                            minlength=len(words)).astype(np.int64)
        return pa.table({
            "lang": b.column("lang"),
            "words": pa.array(words, pa.int64()),
            "longw": pa.array(longw.astype(np.int64), pa.int64()),
            "shortw": pa.array(shortw.astype(np.int64), pa.int64()),
            "chars": pa.array(chars, pa.int64()),
        })

    g = grouped_agg(docs.map_batches(counts, batch_format="pyarrow"),
                    ["lang"], [("n_docs", "words", "count"),
                               ("w", "words", "sum"),
                               ("lw", "longw", "sum"),
                               ("sw", "shortw", "sum"),
                               ("ch", "chars", "sum")])

    def ratios(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column("w"), pa.float64())
        lw = pc.cast(b.column("lw"), pa.float64())
        sw = pc.cast(b.column("sw"), pa.float64())
        ch = pc.cast(b.column("ch"), pa.float64())
        one = pa.scalar(1.0, pa.float64())
        hundred = pa.scalar(100.0, pa.float64())
        return pa.table({
            "lang": b.column("lang"),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "avg_word_len": round_like_duckdb(
                pc.divide(pc.multiply(ch, one), w), 6),
            "long_word_pct": round_like_duckdb(
                pc.divide(pc.multiply(hundred, lw), w), 6),
            "short_word_pct": round_like_duckdb(
                pc.divide(pc.multiply(hundred, sw), w), 6),
        })

    return g.map_batches(ratios, batch_format="pyarrow")


QUERIES["q_doc_word_length_profile"] = q_doc_word_length_profile
ORACLE_SQL["q_doc_word_length_profile"] = """
    WITH d AS (
      SELECT lang,
             len(string_split(text, ' ')) AS words,
             len(list_filter(string_split(text, ' '),
                             x -> len(x) > 6)) AS longw,
             len(list_filter(string_split(text, ' '),
                             x -> len(x) < 4)) AS shortw,
             len(replace(text, ' ', '')) AS chars
      FROM documents
    ),
    g AS (
      SELECT lang, count(*) AS n_docs, sum(words) AS w,
             sum(longw) AS lw, sum(shortw) AS sw, sum(chars) AS ch
      FROM d GROUP BY 1
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           round(ch * 1.0 / w, 6) AS avg_word_len,
           round(100.0 * lw / w, 6) AS long_word_pct,
           round(100.0 * sw / w, 6) AS short_word_pct
    FROM g
"""


def _paired_user_diffs(sf_dir: str):
    """Shared preamble of the Wilcoxon signed-rank and sign tests:
    per-user round-6 differences of mean purchase value minus mean click
    value (users with both, zero differences dropped), materialized once
    as (d, ad=|d|).  One combiner fold of conditional sums/counts."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        isc = pc.cast(pc.equal(b.column("event_type"),
                               pa.scalar("click")), pa.int64())
        isp = pc.cast(pc.equal(b.column("event_type"),
                               pa.scalar("purchase")), pa.int64())
        v = b.column("value")
        return pa.table({
            "user_id": b.column("user_id"),
            "cv": pc.multiply(v, pc.cast(isc, pa.float64())),
            "isc": isc,
            "pv": pc.multiply(v, pc.cast(isp, pa.float64())),
            "isp": isp,
        })

    u = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                    ["user_id"],
                    [("sc", "cv", "sum"), ("nc", "isc", "sum"),
                     ("sp", "pv", "sum"), ("np_", "isp", "sum")])

    def diffs(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(b.column("nc"), pa.scalar(0.0)),
                       pc.greater(b.column("np_"), pa.scalar(0.0)))
        b = b.filter(keep)
        d = round_like_duckdb(
            pc.subtract(pc.divide(b.column("sp"), b.column("np_")),
                        pc.divide(b.column("sc"), b.column("nc"))), 6)
        t = pa.table({"d": d, "ad": pc.abs(d)})
        return t.filter(pc.not_equal(t.column("d"),
                                     pa.scalar(0.0, pa.float64())))

    return u.map_batches(diffs, batch_format="pyarrow").materialize()


def q_click_purchase_wilcoxon(sf_dir: str):
    """Wilcoxon signed-rank test on paired per-user means: does a user's
    average purchase value exceed their average click value?  The
    nonparametric paired-t companion to McNemar on the same user
    pairing: per-user conditional means fold in one combiner, the
    round-6 differences rank via the |distinct|-row fractional-rank
    machinery (tie-averaged, zero-differences dropped), W⁺ sums exact
    half-integer ranks, and z applies the tie-corrected normal
    approximation."""
    from ..stages.agg import _fractional_ranks, grouped_agg, grouped_map, \
        round_like_duckdb
    from ..stages.joins import hash_join

    dds = _paired_user_diffs(sf_dir)
    ranks = _fractional_ranks(dds, "ad", "__r")
    j = hash_join(dds, ranks, left_key="ad", right_key="ad", how="inner")

    def fold(b: pa.Table) -> pa.Table:
        pos = pc.cast(pc.greater(b.column("d"),
                                 pa.scalar(0.0, pa.float64())),
                      pa.float64())
        return _add_g(pa.table({
            "wterm": pc.multiply(pos, b.column("__r")),
            "one": pc.cast(pc.greater(b.column("ad"),
                                      pa.scalar(-1.0, pa.float64())),
                           pa.int64()),
        }))

    w = grouped_agg(j.map_batches(fold, batch_format="pyarrow"), ["__g"],
                    [("wplus", "wterm", "sum"), ("n", "one", "sum")])

    tie_cells = grouped_agg(dds, ["ad"], [("c", "ad", "count")])

    def tie_fold(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("c"), pa.float64())
        return _add_g(pa.table({
            "t3": pc.subtract(pc.multiply(pc.multiply(c, c), c), c)}))

    tie = _to_table(grouped_agg(
        tie_cells.map_batches(tie_fold, batch_format="pyarrow"), ["__g"],
        [("tc", "t3", "sum")]))
    tc = float(tie.column("tc")[0].as_py()) if tie.num_rows else 0.0

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_pairs": pa.array([], pa.int64()),
            "w_plus": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        n = float(r["n"])
        if n < 1.0:
            return empty
        wplus = float(r["wplus"])
        var = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tc / 48.0
        z = ((wplus - n * (n + 1.0) / 4.0) / np.sqrt(var)
             if var > 0.0 else None)
        out = pa.table({
            "n_pairs": pa.array([int(n)], pa.int64()),
            "w_plus": pa.array([wplus], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })
        for name in ("w_plus", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(w, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_pairs", "w_plus", "z"]),
        batch_format="pyarrow")


QUERIES["q_click_purchase_wilcoxon"] = q_click_purchase_wilcoxon
ORACLE_SQL["q_click_purchase_wilcoxon"] = """
    WITH e AS (
      SELECT user_id, event_type, value
      FROM events WHERE value IS NOT NULL
    ),
    u AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click' THEN value
                      ELSE 0 END) AS sc,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN event_type = 'purchase' THEN value
                      ELSE 0 END) AS sp,
             sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS np
      FROM e GROUP BY 1
    ),
    d0 AS (
      SELECT round(sp / np - sc / nc, 6) AS d
      FROM u WHERE nc > 0 AND np > 0
    ),
    d2 AS (SELECT d, abs(d) AS ad FROM d0 WHERE d <> 0),
    r AS (
      SELECT d,
             rank() OVER (ORDER BY ad)
                 + (count(*) OVER (PARTITION BY ad) - 1) / 2.0 AS fr
      FROM d2
    ),
    w AS (
      SELECT count(*) * 1.0 AS n,
             sum(CASE WHEN d > 0 THEN fr ELSE 0 END) AS wplus
      FROM r
    ),
    tie AS (
      SELECT coalesce(sum(c * c * c - c), 0) * 1.0 AS tc
      FROM (SELECT count(*) AS c FROM d2 GROUP BY ad)
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(wplus, 6) AS w_plus,
           round((wplus - n * (n + 1.0) / 4.0)
                 / sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0
                        - tc / 48.0), 6) AS z
    FROM w, tie
"""


def q_priority_size_somers_d(sf_dir: str):
    """Somers' D between order priority level and order-value quintile —
    the ASYMMETRIC ordinal association (gamma's directional sibling):
    d_yx = (C−D)/(C+D+T_y) treats value quintile as the dependent,
    d_xy the reverse.  Same 5×5 contingency as q_priority_size_gamma
    (one combiner; exact-quantile edges); concordant/discordant/tie
    pair counts fold in exact integer math, so both coefficients are
    bitwise deterministic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    qs = global_exact_quantiles(
        ords, "o_totalprice",
        [("q1", 0.2), ("q2", 0.4), ("q3", 0.6), ("q4", 0.8)], round_to=6)
    edges = [qs["q1"], qs["q2"], qs["q3"], qs["q4"]]

    def cells(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        quint = np.searchsorted(np.array(edges), v, side="left")
        pr = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        lvl = np.array([int(p.split("-")[0]) for p in pr], np.int64)
        return pa.table({"lvl": pa.array(lvl, pa.int64()),
                         "quint": pa.array(quint.astype(np.int64))})

    g = grouped_agg(ords.map_batches(cells, batch_format="pyarrow"),
                    ["lvl", "quint"], [("n", "lvl", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_concordant": pa.array([], pa.int64()),
            "n_discordant": pa.array([], pa.int64()),
            "ties_x_only": pa.array([], pa.int64()),
            "ties_y_only": pa.array([], pa.int64()),
            "somers_d_yx": pa.array([], pa.float64()),
            "somers_d_xy": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        lvl = t.column("lvl").to_numpy(zero_copy_only=False)
        qu = t.column("quint").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        C = D = TX = TY = 0
        for i in range(len(n)):
            conc = (lvl > lvl[i]) & (qu > qu[i])
            disc = (lvl > lvl[i]) & (qu < qu[i])
            tx = (lvl == lvl[i]) & (qu > qu[i])
            ty = (qu == qu[i]) & (lvl > lvl[i])
            C += int(n[i]) * int(n[conc].sum())
            D += int(n[i]) * int(n[disc].sum())
            TX += int(n[i]) * int(n[tx].sum())
            TY += int(n[i]) * int(n[ty].sum())
        dyx = (C - D) * 1.0 / (C + D + TY) if C + D + TY > 0 else None
        dxy = (C - D) * 1.0 / (C + D + TX) if C + D + TX > 0 else None
        out = pa.table({
            "n_concordant": pa.array([C], pa.int64()),
            "n_discordant": pa.array([D], pa.int64()),
            "ties_x_only": pa.array([TX], pa.int64()),
            "ties_y_only": pa.array([TY], pa.int64()),
            "somers_d_yx": pa.array([dyx], pa.float64()),
            "somers_d_xy": pa.array([dxy], pa.float64()),
        })
        for name in ("somers_d_yx", "somers_d_xy"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_concordant", "n_discordant", "ties_x_only",
                            "ties_y_only", "somers_d_yx", "somers_d_xy"]),
        batch_format="pyarrow")


QUERIES["q_priority_size_somers_d"] = q_priority_size_somers_d
ORACLE_SQL["q_priority_size_somers_d"] = """
    WITH e AS (
      SELECT round(quantile_cont(o_totalprice, 0.2), 6) AS q1,
             round(quantile_cont(o_totalprice, 0.4), 6) AS q2,
             round(quantile_cont(o_totalprice, 0.6), 6) AS q3,
             round(quantile_cont(o_totalprice, 0.8), 6) AS q4
      FROM orders
    ),
    s AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
             CASE WHEN o_totalprice > q4 THEN 4
                  WHEN o_totalprice > q3 THEN 3
                  WHEN o_totalprice > q2 THEN 2
                  WHEN o_totalprice > q1 THEN 1
                  ELSE 0 END AS quint
      FROM orders, e
    ),
    c AS (SELECT lvl, quint, count(*) AS n FROM s GROUP BY 1, 2),
    p AS (
      SELECT sum(a.n * b.n) FILTER (WHERE b.lvl > a.lvl
                                      AND b.quint > a.quint) AS conc,
             sum(a.n * b.n) FILTER (WHERE b.lvl > a.lvl
                                      AND b.quint < a.quint) AS disc,
             sum(a.n * b.n) FILTER (WHERE b.lvl = a.lvl
                                      AND b.quint > a.quint) AS tx,
             sum(a.n * b.n) FILTER (WHERE b.quint = a.quint
                                      AND b.lvl > a.lvl) AS ty
      FROM c a, c b
    )
    SELECT CAST(conc AS BIGINT) AS n_concordant,
           CAST(disc AS BIGINT) AS n_discordant,
           CAST(tx AS BIGINT) AS ties_x_only,
           CAST(ty AS BIGINT) AS ties_y_only,
           round((conc - disc) * 1.0 / (conc + disc + ty), 6)
               AS somers_d_yx,
           round((conc - disc) * 1.0 / (conc + disc + tx), 6)
               AS somers_d_xy
    FROM p
"""


def q_segment_priority_cramers_v(sf_dir: str):
    """Cramér's V for market segment × order priority — the [0,1]-bounded
    effect size that makes the chi-square (q_segment_priority_chi2)
    comparable across tables: V = √((χ²/n)/(min(r,c)−1)).  Same one-pass
    contingency aggregate; the 25-cell fold is driver-trivial and the
    expected-count tree matches the SQL exactly."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_mktsegment"])
    g = grouped_agg(j, ["c_mktsegment", "o_orderpriority"],
                    [("n", "o_custkey", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_rows": pa.array([], pa.int64()),
            "chi2": pa.array([], pa.float64()),
            "dof": pa.array([], pa.int64()),
            "cramers_v": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        x = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        y = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        xs, xi = np.unique(x, return_inverse=True)
        ys, yi = np.unique(y, return_inverse=True)
        obs = np.zeros((len(xs), len(ys)))
        obs[xi, yi] = n
        total = n.sum()
        nx = obs.sum(axis=1)
        ny = obs.sum(axis=0)
        exp = nx[:, None] * ny[None, :] / total
        chi2 = float(((obs - exp) * (obs - exp) / exp).sum())
        k = float(min(len(xs), len(ys)) - 1)
        if k <= 0.0 or total <= 0.0:
            return empty
        v = float(np.sqrt((chi2 / total) / k))
        out = pa.table({
            "n_rows": pa.array([int(total)], pa.int64()),
            "chi2": pa.array([chi2], pa.float64()),
            "dof": pa.array([(len(xs) - 1) * (len(ys) - 1)], pa.int64()),
            "cramers_v": pa.array([v], pa.float64()),
        })
        for name in ("chi2", "cramers_v"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_rows", "chi2", "dof", "cramers_v"]),
        batch_format="pyarrow")


QUERIES["q_segment_priority_cramers_v"] = q_segment_priority_cramers_v
ORACLE_SQL["q_segment_priority_cramers_v"] = """
    WITH j AS (
      SELECT c_mktsegment AS x, o_orderpriority AS y, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY x, y
    ),
    mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY x),
    my AS (SELECT y, sum(n) AS ny FROM j GROUP BY y),
    t AS (SELECT sum(n) AS total FROM j),
    cells AS (
      SELECT mx.nx, my.ny, coalesce(j.n, 0) AS o
      FROM mx CROSS JOIN my
      LEFT JOIN j ON j.x = mx.x AND j.y = my.y
    ),
    chi AS (
      SELECT sum((o - nx * ny / t.total) * (o - nx * ny / t.total)
                 / (nx * ny / t.total)) AS chi2,
             any_value(t.total) * 1.0 AS total,
             (SELECT count(*) FROM mx) AS r,
             (SELECT count(*) FROM my) AS c
      FROM cells CROSS JOIN t
    )
    SELECT CAST(total AS BIGINT) AS n_rows,
           round(chi2, 6) AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(sqrt((chi2 / total) / (least(r, c) - 1.0)), 6)
               AS cramers_v
    FROM chi
"""


def q_nation_theil_decomposition(sf_dir: str):
    """Theil T decomposition of customer-spend inequality into WITHIN-
    nation and BETWEEN-nation components (T = Σwᵢ·Tᵢ + Σwᵢ·ln(μᵢ/μ),
    spend-share weights wᵢ) — "is inequality driven by whales inside
    markets or by rich-vs-poor markets?".  Everything folds from the
    same mergeable per-nation partials (n, Σx, Σx·ln x) as
    q_nation_spend_theil; the k=|nations| fold is driver-trivial."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    spend = _nation_customer_spend(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        x = b.column("spend")
        return pa.table({
            "n_name": b.column("n_name"),
            "x": x,
            "xlnx": pc.multiply(x, pc.ln(x)),
        })

    agg = grouped_agg(spend.map_batches(proj, batch_format="pyarrow"),
                      ["n_name"],
                      [("n", "x", "count"), ("sx", "x", "sum"),
                       ("sxlnx", "xlnx", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_groups": pa.array([], pa.int64()),
            "theil_total": pa.array([], pa.float64()),
            "theil_within": pa.array([], pa.float64()),
            "theil_between": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sl = t.column("sxlnx").to_numpy(zero_copy_only=False)
        N, S, SL = n.sum(), sx.sum(), sl.sum()
        if N <= 0.0 or S <= 0.0:
            return empty
        mu = S / N
        t_total = SL / (N * mu) - np.log(mu)
        mu_i = sx / n
        t_i = sl / (n * mu_i) - np.log(mu_i)
        w = sx / S
        t_within = float((w * t_i).sum())
        t_between = float((w * np.log(mu_i / mu)).sum())
        out = pa.table({
            "n_groups": pa.array([len(n)], pa.int64()),
            "theil_total": pa.array([float(t_total)], pa.float64()),
            "theil_within": pa.array([t_within], pa.float64()),
            "theil_between": pa.array([t_between], pa.float64()),
        })
        for name in ("theil_total", "theil_within", "theil_between"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(agg.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_groups", "theil_total", "theil_within",
                            "theil_between"]),
        batch_format="pyarrow")


QUERIES["q_nation_theil_decomposition"] = q_nation_theil_decomposition
ORACLE_SQL["q_nation_theil_decomposition"] = """
    WITH spend AS (
        SELECT o_custkey, sum(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT n_name, spend
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    ),
    g AS (
        SELECT n_name, count(*) * 1.0 AS n, sum(spend) AS sx,
               sum(spend * ln(spend)) AS sxlnx
        FROM j GROUP BY 1
    ),
    tt AS (
        SELECT sum(n) AS nn, sum(sx) AS s, sum(sxlnx) AS sl,
               count(*) AS k
        FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           round(sl / (nn * (s / nn)) - ln(s / nn), 6) AS theil_total,
           round(sum((sx / s) * (sxlnx / (n * (sx / n)) - ln(sx / n))),
                 6) AS theil_within,
           round(sum((sx / s) * ln((sx / n) / (s / nn))), 6)
               AS theil_between
    FROM g, tt
    GROUP BY k, nn, s, sl
"""


def q_event_type_friedman(sf_dir: str):
    """Friedman test: do event types rank consistently by daily total
    value, with days as repeated-measure blocks?  The nonparametric
    repeated-measures ANOVA — the right test when per-day totals share a
    day effect that one-way tests would smear.  Per-(day, type) totals
    fold in one combiner (round-6, the shared rank basis); within-day
    tie-averaged ranks are computed inside each day's co-partition run
    (only complete blocks — days where every type appears — count);
    χ²_F folds from the k per-type rank sums."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"day": day, "event_type": b.column("event_type"),
                         "value": b.column("value")})

    s = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                    ["day", "event_type"], [("v", "value", "sum")])
    s = s.map_batches(
        lambda b: pa.table({"day": b.column("day"),
                            "event_type": b.column("event_type"),
                            "v": round_like_duckdb(b.column("v"), 6)}),
        batch_format="pyarrow").materialize()

    types = _to_table(grouped_agg(s, ["event_type"],
                                  [("c", "v", "count")]))
    k = types.num_rows
    if k == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "n_days": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "chi2_friedman": pa.array([], pa.float64())}))

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "fr": pa.array([], pa.float64())})

    def rank_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("day", "ascending"), ("v", "ascending")])
        bounds = _key_run_bounds(t, ["day"])
        sizes = np.diff(bounds)
        v = t.column("v").to_numpy(zero_copy_only=False)
        pos = (np.arange(t.num_rows, dtype=np.int64)
               - np.repeat(bounds[:-1], sizes))
        # tie-averaged rank within each day run: rank() + (peers-1)/2
        fr = np.empty(t.num_rows, np.float64)
        for ri in range(len(sizes)):
            s0, e0 = int(bounds[ri]), int(bounds[ri + 1])
            vv = v[s0:e0]
            lo = np.searchsorted(vv, vv, side="left")
            hi = np.searchsorted(vv, vv, side="right")
            fr[s0:e0] = lo + 1.0 + (hi - lo - 1.0) / 2.0
        keep = np.repeat(sizes == k, sizes)
        return pa.table({
            "event_type": t.column("event_type").filter(pa.array(keep)),
            "fr": pa.array(fr[keep], pa.float64()),
        })

    ranked = grouped_map(s, "day", rank_part, per_group=False,
                         empty_schema=pa.table({
                             "day": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "v": pa.array([], pa.float64())}))
    rj = grouped_agg(ranked, ["event_type"],
                     [("rj", "fr", "sum"), ("nd", "fr", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty_out = pa.table({
            "n_days": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "chi2_friedman": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty_out
        rjs = t.column("rj").to_numpy(zero_copy_only=False)
        n = float(t.column("nd").to_numpy(zero_copy_only=False).max())
        kk = float(k)
        if n == 0.0:
            return empty_out
        chi2 = (12.0 / (n * kk * (kk + 1.0)) * (rjs * rjs).sum()
                - 3.0 * n * (kk + 1.0))
        out = pa.table({
            "n_days": pa.array([int(n)], pa.int64()),
            "n_types": pa.array([k], pa.int64()),
            "chi2_friedman": pa.array([float(chi2)], pa.float64()),
        })
        idx = out.column_names.index("chi2_friedman")
        return out.set_column(
            idx, "chi2_friedman",
            round_like_duckdb(out.column("chi2_friedman"), 6))

    out = grouped_map(rj.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "n_types", "chi2_friedman"]),
        batch_format="pyarrow")


QUERIES["q_event_type_friedman"] = q_event_type_friedman
ORACLE_SQL["q_event_type_friedman"] = """
    WITH s AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             event_type, round(sum(value), 6) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    k AS (SELECT count(DISTINCT event_type) AS k FROM s),
    fd AS (
      SELECT day FROM s GROUP BY day
      HAVING count(*) = (SELECT k FROM k)
    ),
    r AS (
      SELECT event_type,
             rank() OVER (PARTITION BY day ORDER BY v)
                 + (count(*) OVER (PARTITION BY day, v) - 1) / 2.0 AS fr
      FROM s WHERE day IN (SELECT day FROM fd)
    ),
    rj AS (SELECT event_type, sum(fr) AS rj FROM r GROUP BY 1),
    n AS (SELECT count(*) * 1.0 AS n FROM fd)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(k.k AS BIGINT) AS n_types,
           round(12.0 / (n * k.k * (k.k + 1.0)) * sum(rj * rj)
                 - 3.0 * n * (k.k + 1.0), 6) AS chi2_friedman
    FROM rj, n, k
    GROUP BY n, k.k
"""


def q_daily_revenue_qty_dcor(sf_dir: str):
    """Distance correlation between daily revenue (half-up-rounded $k,
    an exact integer) and daily order count — the dependence measure
    that is ZERO only under true independence, catching nonlinear and
    non-monotone coupling that Pearson/Spearman miss.  The O(n²)
    double-centering NEVER materializes centered matrices: the identity
    ΣA·B = P − 2R/n + g·g′/n² reduces everything to exact integer sums
    (pairwise products P, row-sum products R, grand totals g), so the
    final three-term float tree is bitwise deterministic on both sides
    (n ≈ 2.4k days → one vectorized int64 shot; at larger n roll up to
    weeks first)."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def day_cents(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        c = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"day": day, "cents": c})

    daily = grouped_agg(ords.map_batches(day_cents, batch_format="pyarrow"),
                        ["day"], [("c", "cents", "sum"),
                                  ("m", "cents", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "dcov2": pa.array([], pa.float64()),
            "dcor": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        m = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        # exact half-up $k: floor((cents + 50000) / 100000)
        x = (c + 50_000) // 100_000
        n = float(len(x))
        ax = np.abs(x[:, None] - x[None, :])
        ay = np.abs(m[:, None] - m[None, :])
        pxy = int((ax * ay).sum())
        pxx = int((ax * ax).sum())
        pyy = int((ay * ay).sum())
        rx = ax.sum(axis=1)
        ry = ay.sum(axis=1)
        rxy = sum(int(a) * int(b) for a, b in zip(rx, ry))
        rxx = sum(int(a) * int(a) for a in rx)
        ryy = sum(int(a) * int(a) for a in ry)
        gx, gy = int(rx.sum()), int(ry.sum())

        def stat(p, r, g1, g2):
            return (float(p) / (n * n) - 2.0 * float(r) / (n * n * n)
                    + (float(g1) * float(g2)) / (n * n * n * n))

        dcov2 = stat(pxy, rxy, gx, gy)
        dvx = stat(pxx, rxx, gx, gx)
        dvy = stat(pyy, ryy, gy, gy)
        dcor = (float(np.sqrt(dcov2 / np.sqrt(dvx * dvy)))
                if dvx > 0.0 and dvy > 0.0 and dcov2 > 0.0 else 0.0)
        out = pa.table({
            "n_days": pa.array([len(x)], pa.int64()),
            "dcov2": pa.array([dcov2], pa.float64()),
            "dcor": pa.array([dcor], pa.float64()),
        })
        for name in ("dcov2", "dcor"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "dcov2", "dcor"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_qty_dcor"] = q_daily_revenue_qty_dcor
ORACLE_SQL["q_daily_revenue_qty_dcor"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             (sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) + 50000)
                 // 100000 AS x,
             count(*) AS m
      FROM orders GROUP BY 1
    ),
    rs AS (
      SELECT j.day,
             sum(abs(j.x - q.x)) AS rx,
             sum(abs(j.m - q.m)) AS ry,
             sum(CAST(abs(j.x - q.x) AS HUGEINT)
                 * abs(j.m - q.m)) AS pxy_j,
             sum(CAST(abs(j.x - q.x) AS HUGEINT)
                 * abs(j.x - q.x)) AS pxx_j,
             sum(CAST(abs(j.m - q.m) AS HUGEINT)
                 * abs(j.m - q.m)) AS pyy_j
      FROM d j, d q
      GROUP BY 1
    ),
    agg AS (
      SELECT count(*) * 1.0 AS n,
             sum(pxy_j) AS pxy, sum(pxx_j) AS pxx, sum(pyy_j) AS pyy,
             sum(CAST(rx AS HUGEINT) * ry) AS rxy,
             sum(CAST(rx AS HUGEINT) * rx) AS rxx,
             sum(CAST(ry AS HUGEINT) * ry) AS ryy,
             sum(rx) AS gx, sum(ry) AS gy
      FROM rs
    ),
    st AS (
      SELECT n,
             CAST(pxy AS DOUBLE) / (n * n)
               - 2.0 * CAST(rxy AS DOUBLE) / (n * n * n)
               + (CAST(gx AS DOUBLE) * CAST(gy AS DOUBLE))
                 / (n * n * n * n) AS dcov2,
             CAST(pxx AS DOUBLE) / (n * n)
               - 2.0 * CAST(rxx AS DOUBLE) / (n * n * n)
               + (CAST(gx AS DOUBLE) * CAST(gx AS DOUBLE))
                 / (n * n * n * n) AS dvx,
             CAST(pyy AS DOUBLE) / (n * n)
               - 2.0 * CAST(ryy AS DOUBLE) / (n * n * n)
               + (CAST(gy AS DOUBLE) * CAST(gy AS DOUBLE))
                 / (n * n * n * n) AS dvy
      FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(dcov2, 6) AS dcov2,
           round(CASE WHEN dvx > 0 AND dvy > 0 AND dcov2 > 0
                      THEN sqrt(dcov2 / sqrt(dvx * dvy))
                      ELSE 0.0 END, 6) AS dcor
    FROM st
"""


def q_click_purchase_sign_test(sf_dir: str):
    """Paired sign test on the same per-user pairing as the Wilcoxon:
    counts of users whose mean purchase value beats their mean click
    value vs the reverse, and the continuity-corrected normal z =
    (|n⁺−n⁻|−1)/√(n⁺+n⁻) — the assumption-free fallback when even the
    signed-rank's symmetry premise is doubted.  Shares the materialized
    round-6 paired-difference table; the fold is exact integers."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    dds = _paired_user_diffs(sf_dir)

    def flags(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0.0, pa.float64())
        return _add_g(pa.table({
            "pos": pc.cast(pc.greater(b.column("d"), zero), pa.int64()),
            "neg": pc.cast(pc.less(b.column("d"), zero), pa.int64()),
        }))

    g = grouped_agg(dds.map_batches(flags, batch_format="pyarrow"),
                    ["__g"], [("npos", "pos", "sum"),
                              ("nneg", "neg", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_pos": pa.array([], pa.int64()),
            "n_neg": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        npos, nneg = int(r["npos"]), int(r["nneg"])
        tot = npos + nneg
        z = ((abs(npos - nneg) - 1.0) / np.sqrt(float(tot))
             if tot > 0 else None)
        out = pa.table({
            "n_pos": pa.array([npos], pa.int64()),
            "n_neg": pa.array([nneg], pa.int64()),
            "z": pa.array([z], pa.float64()),
        })
        idx = out.column_names.index("z")
        return out.set_column(idx, "z",
                              round_like_duckdb(out.column("z"), 6))

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_pos", "n_neg", "z"]),
        batch_format="pyarrow")


QUERIES["q_click_purchase_sign_test"] = q_click_purchase_sign_test
ORACLE_SQL["q_click_purchase_sign_test"] = """
    WITH e AS (
      SELECT user_id, event_type, value
      FROM events WHERE value IS NOT NULL
    ),
    u AS (
      SELECT user_id,
             sum(CASE WHEN event_type = 'click' THEN value
                      ELSE 0 END) AS sc,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN event_type = 'purchase' THEN value
                      ELSE 0 END) AS sp,
             sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS np
      FROM e GROUP BY 1
    ),
    d0 AS (
      SELECT round(sp / np - sc / nc, 6) AS d
      FROM u WHERE nc > 0 AND np > 0
    ),
    d2 AS (SELECT d FROM d0 WHERE d <> 0),
    s AS (
      SELECT sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS npos,
             sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS nneg
      FROM d2
    )
    SELECT CAST(npos AS BIGINT) AS n_pos,
           CAST(nneg AS BIGINT) AS n_neg,
           round((abs(npos - nneg) - 1.0) * 1.0
                 / sqrt((npos + nneg) * 1.0), 6) AS z
    FROM s
"""


def q_weekend_purchase_irr(sf_dir: str):
    """Incidence rate ratio of purchases per active DAY, weekend vs
    weekday: IRR = (P_we/D_we)/(P_wd/D_wd) with the Poisson log-scale
    95% CI exp(ln IRR ± 1.96·√(1/P_we + 1/P_wd)) — the rate-based
    companion to the event-level odds ratio (which ignores exposure
    time).  One per-day combiner fold (day → weekend flag + purchase
    count); the 2×2 rate fold is exact integers."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "day": day,
            "p": pc.cast(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")), pa.int64()),
        })

    days = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                       ["day"], [("np_", "p", "sum")])

    def flags(b: pa.Table) -> pa.Table:
        # pyarrow has no modulo kernel: a - (a // 7) * 7
        a = pc.add(b.column("day"), pa.scalar(3, pa.int64()))
        seven = pa.scalar(7, pa.int64())
        dow = pc.add(pc.subtract(a, pc.multiply(
            pc.divide(a, seven), seven)), pa.scalar(1, pa.int64()))
        wk = pc.cast(pc.greater_equal(dow, pa.scalar(6, pa.int64())),
                     pa.int64())
        one = pa.scalar(1, pa.int64())
        npd = pc.cast(b.column("np_"), pa.int64())
        return _add_g(pa.table({
            "p_we": pc.multiply(wk, npd),
            "p_wd": pc.multiply(pc.subtract(one, wk), npd),
            "d_we": wk,
            "d_wd": pc.subtract(one, wk),
        }))

    g = grouped_agg(days.map_batches(flags, batch_format="pyarrow"),
                    ["__g"], [("p_we", "p_we", "sum"),
                              ("p_wd", "p_wd", "sum"),
                              ("d_we", "d_we", "sum"),
                              ("d_wd", "d_wd", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "purchases_weekend": pa.array([], pa.int64()),
            "purchases_weekday": pa.array([], pa.int64()),
            "days_weekend": pa.array([], pa.int64()),
            "days_weekday": pa.array([], pa.int64()),
            "irr": pa.array([], pa.float64()),
            "ci_lo": pa.array([], pa.float64()),
            "ci_hi": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        pwe, pwd = int(r["p_we"]), int(r["p_wd"])
        dwe, dwd = int(r["d_we"]), int(r["d_wd"])
        if pwe == 0 or pwd == 0 or dwe == 0 or dwd == 0:
            return empty
        irr = (pwe * 1.0 / dwe) / (pwd * 1.0 / dwd)
        half = 1.96 * np.sqrt(1.0 / pwe + 1.0 / pwd)
        out = pa.table({
            "purchases_weekend": pa.array([pwe], pa.int64()),
            "purchases_weekday": pa.array([pwd], pa.int64()),
            "days_weekend": pa.array([dwe], pa.int64()),
            "days_weekday": pa.array([dwd], pa.int64()),
            "irr": pa.array([irr], pa.float64()),
            "ci_lo": pa.array([float(np.exp(np.log(irr) - half))],
                              pa.float64()),
            "ci_hi": pa.array([float(np.exp(np.log(irr) + half))],
                              pa.float64()),
        })
        for name in ("irr", "ci_lo", "ci_hi"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["purchases_weekend", "purchases_weekday",
                            "days_weekend", "days_weekday", "irr",
                            "ci_lo", "ci_hi"]),
        batch_format="pyarrow")


QUERIES["q_weekend_purchase_irr"] = q_weekend_purchase_irr
ORACLE_SQL["q_weekend_purchase_irr"] = """
    WITH d AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS np
      FROM events GROUP BY 1
    ),
    f AS (
      SELECT CASE WHEN (day + 3) % 7 + 1 >= 6 THEN 1 ELSE 0 END AS wk,
             np
      FROM d
    ),
    g AS (
      SELECT sum(wk * np) AS pwe, sum((1 - wk) * np) AS pwd,
             sum(wk) AS dwe, sum(1 - wk) AS dwd
      FROM f
    )
    SELECT CAST(pwe AS BIGINT) AS purchases_weekend,
           CAST(pwd AS BIGINT) AS purchases_weekday,
           CAST(dwe AS BIGINT) AS days_weekend,
           CAST(dwd AS BIGINT) AS days_weekday,
           round((pwe * 1.0 / dwe) / (pwd * 1.0 / dwd), 6) AS irr,
           round(exp(ln((pwe * 1.0 / dwe) / (pwd * 1.0 / dwd))
                     - 1.96 * sqrt(1.0 / pwe + 1.0 / pwd)), 6) AS ci_lo,
           round(exp(ln((pwe * 1.0 / dwe) / (pwd * 1.0 / dwd))
                     + 1.96 * sqrt(1.0 / pwe + 1.0 / pwd)), 6) AS ci_hi
    FROM g
"""


def q_daily_revenue_pacf(sf_dir: str):
    """Partial autocorrelation of daily revenue at lags 1-3 via the
    Durbin-Levinson recursion on the round-6 ACF — the AR-order
    selection companion to the Ljung-Box screen (PACF cutting off at
    lag p ⇒ fit AR(p)).  The recursion runs on ROUNDED ρ so both sides
    evaluate an identical small rational tree; one combiner exchange to
    the tiny daily table."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "rho1": pa.array([], pa.float64()),
            "rho2": pa.array([], pa.float64()),
            "rho3": pa.array([], pa.float64()),
            "pacf1": pa.array([], pa.float64()),
            "pacf2": pa.array([], pa.float64()),
            "pacf3": pa.array([], pa.float64()),
        })
        if t.num_rows < 5:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = float(len(c))
        e = c - c.sum() / n
        s0 = (e * e).sum()
        if s0 <= 0.0:
            return empty
        r1 = float(np.round((e[1:] * e[:-1]).sum() / s0, 6))
        r2 = float(np.round((e[2:] * e[:-2]).sum() / s0, 6))
        r3 = float(np.round((e[3:] * e[:-3]).sum() / s0, 6))
        p11 = r1
        p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        p21 = r1 - p22 * r1
        p33 = ((r3 - p21 * r2 - p22 * r1)
               / (1.0 - p21 * r1 - p22 * r2))
        out = pa.table({
            "n_days": pa.array([int(n)], pa.int64()),
            "rho1": pa.array([r1], pa.float64()),
            "rho2": pa.array([r2], pa.float64()),
            "rho3": pa.array([r3], pa.float64()),
            "pacf1": pa.array([p11], pa.float64()),
            "pacf2": pa.array([p22], pa.float64()),
            "pacf3": pa.array([p33], pa.float64()),
        })
        for name in ("pacf1", "pacf2", "pacf3"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "rho1", "rho2", "rho3",
                            "pacf1", "pacf2", "pacf3"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_pacf"] = q_daily_revenue_pacf
ORACLE_SQL["q_daily_revenue_pacf"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    m AS (SELECT sum(c) / count(*) AS mu, count(*) * 1.0 AS n FROM d),
    o AS (
      SELECT c - mu AS e, row_number() OVER (ORDER BY day) AS rn, n
      FROM d, m
    ),
    den AS (SELECT sum(e * e) AS s0, any_value(n) AS n FROM o),
    r AS (
      SELECT k.k AS lag,
             round(sum(a.e * b.e) / any_value(den.s0), 6) AS rho
      FROM generate_series(1, 3) k(k)
      JOIN o a ON TRUE
      JOIN o b ON b.rn = a.rn + k.k, den
      GROUP BY 1
    ),
    w AS (
      SELECT max(CASE WHEN lag = 1 THEN rho END) AS r1,
             max(CASE WHEN lag = 2 THEN rho END) AS r2,
             max(CASE WHEN lag = 3 THEN rho END) AS r3
      FROM r
    ),
    p2 AS (
      SELECT r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
      FROM w
    ),
    p3 AS (
      SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM p2
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM den) AS n_days,
           r1 AS rho1, r2 AS rho2, r3 AS rho3,
           round(r1, 6) AS pacf1,
           round(p22, 6) AS pacf2,
           round((r3 - p21 * r2 - p22 * r1)
                 / (1.0 - p21 * r1 - p22 * r2), 6) AS pacf3
    FROM p3
"""


def q_lineitem_price_regression2(sf_dir: str):
    """Two-predictor OLS: line price (rounded to whole dollars, an exact
    integer) on quantity AND discount percent, solved in closed form via
    the 2×2 normal equations — the multivariable upgrade of
    q_lineitem_price_regression that separates the quantity effect from
    the discount effect.  ALL ten moment sums are exact int64 on the
    combiner (HUGEINT in SQL), so the Cramer's-rule betas, intercept,
    and R² are a bitwise-deterministic float tree."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_quantity", "l_discount", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        half = pa.scalar(0.5, pa.float64())
        # half-up: floor(x + 0.5) — pc.round is half-to-even and would
        # disagree with DuckDB on exact .50 dollar boundaries
        x = pc.cast(pc.floor(pc.add(b.column("l_quantity"), half)),
                    pa.int64())
        z = pc.cast(pc.floor(pc.add(pc.multiply(
            b.column("l_discount"), pa.scalar(100.0, pa.float64())),
            half)), pa.int64())
        y = pc.cast(pc.floor(pc.add(b.column("l_extendedprice"), half)),
                    pa.int64())
        return _add_g(pa.table({
            "x": x, "z": z, "y": y,
            "xx": pc.multiply(x, x), "zz": pc.multiply(z, z),
            "yy": pc.multiply(y, y), "xz": pc.multiply(x, z),
            "xy": pc.multiply(x, y), "zy": pc.multiply(z, y),
        }))

    g = grouped_agg(li.map_batches(prep, batch_format="pyarrow"), ["__g"],
                    [("n", "x", "count"), ("sx", "x", "sum"),
                     ("sz", "z", "sum"), ("sy", "y", "sum"),
                     ("sxx", "xx", "sum"), ("szz", "zz", "sum"),
                     ("syy", "yy", "sum"), ("sxz", "xz", "sum"),
                     ("sxy", "xy", "sum"), ("szy", "zy", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_rows": pa.array([], pa.int64()),
            "b_qty": pa.array([], pa.float64()),
            "b_disc": pa.array([], pa.float64()),
            "intercept": pa.array([], pa.float64()),
            "r2": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        n = float(r["n"])
        if n < 3.0:
            return empty
        sx, sz, sy = float(r["sx"]), float(r["sz"]), float(r["sy"])
        Sxx = float(r["sxx"]) - sx * sx / n
        Szz = float(r["szz"]) - sz * sz / n
        Syy = float(r["syy"]) - sy * sy / n
        Sxz = float(r["sxz"]) - sx * sz / n
        Sxy = float(r["sxy"]) - sx * sy / n
        Szy = float(r["szy"]) - sz * sy / n
        det = Sxx * Szz - Sxz * Sxz
        if det == 0.0 or Syy <= 0.0:
            return empty
        b1 = (Szz * Sxy - Sxz * Szy) / det
        b2 = (Sxx * Szy - Sxz * Sxy) / det
        a = sy / n - b1 * (sx / n) - b2 * (sz / n)
        r2 = (b1 * Sxy + b2 * Szy) / Syy
        out = pa.table({
            "n_rows": pa.array([int(n)], pa.int64()),
            "b_qty": pa.array([b1], pa.float64()),
            "b_disc": pa.array([b2], pa.float64()),
            "intercept": pa.array([a], pa.float64()),
            "r2": pa.array([r2], pa.float64()),
        })
        for name in ("b_qty", "b_disc", "intercept", "r2"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_rows", "b_qty", "b_disc", "intercept",
                            "r2"]),
        batch_format="pyarrow")


QUERIES["q_lineitem_price_regression2"] = q_lineitem_price_regression2
ORACLE_SQL["q_lineitem_price_regression2"] = """
    WITH p AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS z,
             CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    g AS (
      SELECT count(*) * 1.0 AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(z * z) AS DOUBLE) AS szz,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * z) AS DOUBLE) AS sxz,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(z * y) AS DOUBLE) AS szy
      FROM p
    ),
    c AS (
      SELECT n,
             sxx - sx * sx / n AS cxx, szz - sz * sz / n AS czz,
             syy - sy * sy / n AS cyy, sxz - sx * sz / n AS cxz,
             sxy - sx * sy / n AS cxy, szy - sz * sy / n AS czy,
             sx, sz, sy
      FROM g
    ),
    b AS (
      SELECT n, sx, sz, sy, cxy, czy, cyy,
             (czz * cxy - cxz * czy) / (cxx * czz - cxz * cxz) AS b1,
             (cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz) AS b2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(b1, 6) AS b_qty,
           round(b2, 6) AS b_disc,
           round(sy / n - b1 * (sx / n) - b2 * (sz / n), 6) AS intercept,
           round((b1 * cxy + b2 * czy) / cyy, 6) AS r2
    FROM b
"""


def q_order_price_grubbs(sf_dir: str):
    """Grubbs' max-outlier statistic on order value (rounded to whole
    dollars): G = max|x−μ|/s — the single-outlier screen whose critical
    value gates automated anomaly tickets.  Two passes over the stream:
    one combiner fold for the exact integer (n, Σx, Σx²) moments, then a
    broadcast-μ max fold — both fully distributed and order-invariant."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ords = _read(sf_dir, "orders", ["o_totalprice"])

    def dollars(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.add(b.column("o_totalprice"),
                                    pa.scalar(0.5, pa.float64()))),
                    pa.int64())
        return _add_g(pa.table({"x": x, "xx": pc.multiply(x, x)}))

    d = ords.map_batches(dollars, batch_format="pyarrow").materialize()
    # sum_as_float=False: Σx² exceeds 2^53 at sf≥0.1, so keep the exact
    # int64 and convert via Python float() (round-half-even, matching
    # DuckDB's HUGEINT→DOUBLE cast)
    mom = _to_table(grouped_agg(d, ["__g"],
                                [("n", "x", "count"), ("s", "x", "sum"),
                                 ("ssq", "xx", "sum")],
                                sum_as_float=False))
    if mom.num_rows == 0 or int(mom.column("n")[0].as_py()) < 3:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "n_orders": pa.array([], pa.int64()),
            "mean_price": pa.array([], pa.float64()),
            "sd_price": pa.array([], pa.float64()),
            "g_stat": pa.array([], pa.float64())}))
    n = float(mom.column("n")[0].as_py())
    s = float(mom.column("s")[0].as_py())
    ssq = float(mom.column("ssq")[0].as_py())
    mu = s / n
    sd = float(np.sqrt((ssq - s * s / n) / (n - 1.0)))

    def dev(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("x"), pa.float64())
        return pa.table({
            "__g": b.column("__g"),
            "ad": pc.abs(pc.subtract(x, pa.scalar(mu, pa.float64()))),
        })

    mx = grouped_agg(d.map_batches(dev, batch_format="pyarrow"), ["__g"],
                     [("mad", "ad", "max")])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "n_orders": pa.array([], pa.int64()),
                "mean_price": pa.array([], pa.float64()),
                "sd_price": pa.array([], pa.float64()),
                "g_stat": pa.array([], pa.float64()),
            })
        r = t.to_pylist()[0]
        out = pa.table({
            "n_orders": pa.array([int(n)], pa.int64()),
            "mean_price": pa.array([mu], pa.float64()),
            "sd_price": pa.array([sd], pa.float64()),
            "g_stat": pa.array([float(r["mad"]) / sd if sd > 0.0
                                else None], pa.float64()),
        })
        for name in ("mean_price", "sd_price", "g_stat"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(mx, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_orders", "mean_price", "sd_price",
                            "g_stat"]),
        batch_format="pyarrow")


QUERIES["q_order_price_grubbs"] = q_order_price_grubbs
ORACLE_SQL["q_order_price_grubbs"] = """
    WITH p AS (
      SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x FROM orders
    ),
    m AS (
      SELECT count(*) * 1.0 AS n,
             CAST(sum(x) AS DOUBLE) AS s,
             CAST(sum(x * x) AS DOUBLE) AS ssq
      FROM p
    ),
    st AS (
      SELECT n, s / n AS mu,
             sqrt((ssq - s * s / n) / (n - 1.0)) AS sd
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(mu, 6) AS mean_price,
           round(sd, 6) AS sd_price,
           round(max(abs(x * 1.0 - mu)) / sd, 6) AS g_stat
    FROM p, st
    GROUP BY n, mu, sd
"""


def q_event_type_cochran_q(sf_dir: str):
    """Cochran's Q across three binary per-user "did it" treatments
    (click / view / purchase): Q = (k−1)(kΣC_j² − (ΣC_j)²)/(kΣR_i −
    ΣR_i²) — the k-treatment generalization of McNemar asking whether
    the three actions have equal penetration across the SAME users.
    Per-user flags are one keyed max-combiner; every term is an exact
    integer fold, so Q is bitwise deterministic."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    kinds = ("click", "view", "purchase")

    def flags(b: pa.Table) -> pa.Table:
        cols = {"user_id": b.column("user_id")}
        for kk in kinds:
            cols[f"f_{kk}"] = pc.cast(
                pc.equal(b.column("event_type"), pa.scalar(kk)), pa.int64())
        return pa.table(cols)

    u = grouped_agg(ev.map_batches(flags, batch_format="pyarrow"),
                    ["user_id"],
                    [(f"f_{kk}", f"f_{kk}", "max") for kk in kinds])

    def fold(b: pa.Table) -> pa.Table:
        f1 = b.column("f_click")
        f2 = b.column("f_view")
        f3 = b.column("f_purchase")
        r = pc.add(pc.add(f1, f2), f3)
        return _add_g(pa.table({
            "c1": f1, "c2": f2, "c3": f3,
            "r": r, "rr": pc.multiply(r, r),
        }))

    g = grouped_agg(u.map_batches(fold, batch_format="pyarrow"), ["__g"],
                    [("n_users", "r", "count"), ("c1", "c1", "sum"),
                     ("c2", "c2", "sum"), ("c3", "c3", "sum"),
                     ("sr", "r", "sum"), ("srr", "rr", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_users": pa.array([], pa.int64()),
            "n_click": pa.array([], pa.int64()),
            "n_view": pa.array([], pa.int64()),
            "n_purchase": pa.array([], pa.int64()),
            "q_stat": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        k = 3
        c = [int(r["c1"]), int(r["c2"]), int(r["c3"])]
        sr, srr = int(r["sr"]), int(r["srr"])
        den = k * sr - srr
        q = ((k - 1.0) * (k * sum(x * x for x in c) - sum(c) ** 2) / den
             if den > 0 else None)
        out = pa.table({
            "n_users": pa.array([int(r["n_users"])], pa.int64()),
            "n_click": pa.array([c[0]], pa.int64()),
            "n_view": pa.array([c[1]], pa.int64()),
            "n_purchase": pa.array([c[2]], pa.int64()),
            "q_stat": pa.array([q], pa.float64()),
        })
        idx = out.column_names.index("q_stat")
        return out.set_column(idx, "q_stat",
                              round_like_duckdb(out.column("q_stat"), 6))

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_users", "n_click", "n_view", "n_purchase",
                            "q_stat"]),
        batch_format="pyarrow")


QUERIES["q_event_type_cochran_q"] = q_event_type_cochran_q
ORACLE_SQL["q_event_type_cochran_q"] = """
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f1,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f2,
             max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS f3
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT count(*) AS n_users, sum(f1) AS c1, sum(f2) AS c2,
             sum(f3) AS c3,
             sum(f1 + f2 + f3) AS sr,
             sum((f1 + f2 + f3) * (f1 + f2 + f3)) AS srr
      FROM u
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(c1 AS BIGINT) AS n_click,
           CAST(c2 AS BIGINT) AS n_view,
           CAST(c3 AS BIGINT) AS n_purchase,
           round(2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                        - (c1 + c2 + c3) * (c1 + c2 + c3))
                 / (3 * sr - srr), 6) AS q_stat
    FROM g
"""


def q_weekend_value_levene(sf_dir: str):
    """Levene's test (mean-centered) for equal value variance weekend vs
    weekday: one-way ANOVA F on the absolute deviations Z = |x − x̄_g| —
    the variance-equality gate before a pooled t-test, complementing the
    median-centered Brown-Forsythe on the type split.  Two combiner
    passes (group means, then Z moments); the F tree matches the SQL's
    double ops."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    labeled = _weekend_labeled_events(sf_dir)

    vals = labeled.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow").materialize()
    means = _to_table(grouped_agg(
        vals.map_batches(
            lambda b: pa.table({"variant": b.column("variant"),
                                "value": b.column("value")}),
            batch_format="pyarrow"),
        ["variant"], [("s", "value", "sum"), ("n", "value", "count")]))
    mu = {r["variant"]: r["s"] / r["n"] for r in means.to_pylist()}
    if len(mu) < 2:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "f_stat": pa.array([], pa.float64()),
            "df1": pa.array([], pa.int64()),
            "df2": pa.array([], pa.int64())}))

    def zdev(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        g = b.column("variant").to_numpy(zero_copy_only=False)
        m = np.where(g == "weekend", mu.get("weekend", 0.0),
                     mu.get("weekday", 0.0))
        z = np.abs(v - m)
        return pa.table({"variant": b.column("variant"),
                         "z": pa.array(z, pa.float64()),
                         "zz": pa.array(z * z, pa.float64())})

    zg = grouped_agg(vals.map_batches(zdev, batch_format="pyarrow"),
                     ["variant"], [("n", "z", "count"), ("sz", "z", "sum"),
                                   ("szz", "zz", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "f_stat": pa.array([], pa.float64()),
            "df1": pa.array([], pa.int64()),
            "df2": pa.array([], pa.int64()),
        })
        if t.num_rows < 2:
            return empty
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sz = t.column("sz").to_numpy(zero_copy_only=False)
        szz = t.column("szz").to_numpy(zero_copy_only=False)
        N = n.sum()
        k = float(len(n))
        zbar_g = sz / n
        zbar = sz.sum() / N
        ssb = float((n * (zbar_g - zbar) * (zbar_g - zbar)).sum())
        ssw = float((szz - sz * sz / n).sum())
        if ssw <= 0.0 or N <= k:
            return empty
        f = (ssb / (k - 1.0)) / (ssw / (N - k))
        out = pa.table({
            "f_stat": pa.array([f], pa.float64()),
            "df1": pa.array([int(k - 1)], pa.int64()),
            "df2": pa.array([int(N - k)], pa.int64()),
        })
        idx = out.column_names.index("f_stat")
        return out.set_column(idx, "f_stat",
                              round_like_duckdb(out.column("f_stat"), 6))

    out = grouped_map(zg.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["f_stat", "df1", "df2"]),
        batch_format="pyarrow")


QUERIES["q_weekend_value_levene"] = q_weekend_value_levene
ORACLE_SQL["q_weekend_value_levene"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 'weekend' ELSE 'weekday' END AS variant,
             value
      FROM events WHERE value IS NOT NULL
    ),
    m AS (SELECT variant, sum(value) / count(*) AS mu FROM s GROUP BY 1),
    z AS (
      SELECT s.variant, abs(value - mu) AS z
      FROM s JOIN m ON m.variant = s.variant
    ),
    g AS (
      SELECT variant, count(*) * 1.0 AS n, sum(z) AS sz,
             sum(z * z) AS szz
      FROM z GROUP BY 1
    ),
    tt AS (SELECT sum(n) AS nn, sum(sz) AS tsz, count(*) * 1.0 AS k
           FROM g)
    SELECT round((sum(n * (sz / n - tsz / nn) * (sz / n - tsz / nn))
                  / (k - 1.0))
                 / (sum(szz - sz * sz / n) / (nn - k)), 6) AS f_stat,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(nn - k AS BIGINT) AS df2
    FROM g, tt
    GROUP BY k, nn, tsz
"""


def q_weekend_value_ftest(sf_dir: str):
    """Two-sample F test: ratio of weekend to weekday value variance
    (sample variances, F = s²_we/s²_wd with (n_we−1, n_wd−1) df) — the
    classical scale-shift screen read alongside Levene (which is robust
    to non-normality where this is exact under it).  One combiner fold
    of per-side moments."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    labeled = _weekend_labeled_events(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        wk = pc.cast(pc.equal(b.column("variant"), pa.scalar("weekend")),
                     pa.float64())
        v = b.column("value")
        vv = pc.multiply(v, v)
        one = pa.scalar(1.0, pa.float64())
        wd = pc.subtract(one, wk)
        return _add_g(pa.table({
            "n_we": wk, "s_we": pc.multiply(wk, v),
            "ss_we": pc.multiply(wk, vv),
            "n_wd": wd, "s_wd": pc.multiply(wd, v),
            "ss_wd": pc.multiply(wd, vv),
        }))

    g = grouped_agg(labeled.map_batches(prep, batch_format="pyarrow"),
                    ["__g"],
                    [("n_we", "n_we", "sum"), ("s_we", "s_we", "sum"),
                     ("ss_we", "ss_we", "sum"), ("n_wd", "n_wd", "sum"),
                     ("s_wd", "s_wd", "sum"), ("ss_wd", "ss_wd", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "df_weekend": pa.array([], pa.int64()),
            "df_weekday": pa.array([], pa.int64()),
            "var_weekend": pa.array([], pa.float64()),
            "var_weekday": pa.array([], pa.float64()),
            "f_ratio": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        nwe, nwd = float(r["n_we"]), float(r["n_wd"])
        if nwe < 2.0 or nwd < 2.0:
            return empty
        vwe = (float(r["ss_we"]) - float(r["s_we"]) * float(r["s_we"])
               / nwe) / (nwe - 1.0)
        vwd = (float(r["ss_wd"]) - float(r["s_wd"]) * float(r["s_wd"])
               / nwd) / (nwd - 1.0)
        if vwd <= 0.0:
            return empty
        out = pa.table({
            "df_weekend": pa.array([int(nwe - 1)], pa.int64()),
            "df_weekday": pa.array([int(nwd - 1)], pa.int64()),
            "var_weekend": pa.array([vwe], pa.float64()),
            "var_weekday": pa.array([vwd], pa.float64()),
            "f_ratio": pa.array([vwe / vwd], pa.float64()),
        })
        for name in ("var_weekend", "var_weekday", "f_ratio"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["df_weekend", "df_weekday", "var_weekend",
                            "var_weekday", "f_ratio"]),
        batch_format="pyarrow")


QUERIES["q_weekend_value_ftest"] = q_weekend_value_ftest
ORACLE_SQL["q_weekend_value_ftest"] = """
    WITH s AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1.0 ELSE 0.0 END AS wk,
             value
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT sum(wk) AS nwe, sum(wk * value) AS swe,
             sum(wk * value * value) AS sswe,
             sum(1.0 - wk) AS nwd, sum((1.0 - wk) * value) AS swd,
             sum((1.0 - wk) * value * value) AS sswd
      FROM s
    ),
    v AS (
      SELECT nwe, nwd,
             (sswe - swe * swe / nwe) / (nwe - 1.0) AS vwe,
             (sswd - swd * swd / nwd) / (nwd - 1.0) AS vwd
      FROM g
    )
    SELECT CAST(nwe - 1 AS BIGINT) AS df_weekend,
           CAST(nwd - 1 AS BIGINT) AS df_weekday,
           round(vwe, 6) AS var_weekend,
           round(vwd, 6) AS var_weekday,
           round(vwe / vwd, 6) AS f_ratio
    FROM v
"""


def q_daily_revenue_hurst(sf_dir: str):
    """Hurst exponent of daily revenue via classical rescaled-range
    analysis: for chunk sizes 16/32/64/128, each complete chunk's
    R/S = (max−min of the cumulative mean-deviation)/population-σ is
    averaged, and H is the OLS slope of log₂(mean R/S) on log₂(size) —
    H≈0.5 random walk, >0.5 trending/persistent, <0.5 mean-reverting.
    One combiner exchange to the tiny exact-cents daily table; the
    chunked R/S passes run vectorized over it."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)
    sizes = (16, 32, 64, 128)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "hurst": pa.array([], pa.float64()),
        })
        if t.num_rows < 2 * sizes[-1]:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(c)
        pts = []
        for s in sizes:
            k = n // s
            if k < 2:
                continue
            x = c[:k * s].reshape(k, s)
            m = x.mean(axis=1)
            dev = x - m[:, None]
            cd = np.cumsum(dev, axis=1)
            r = cd.max(axis=1) - cd.min(axis=1)
            sd = np.sqrt((dev * dev).mean(axis=1))
            ok = sd > 0.0
            if not ok.any():
                continue
            rs = float((r[ok] / sd[ok]).sum() / ok.sum())
            pts.append((np.log2(float(s)), np.log2(rs)))
        if len(pts) < 2:
            return empty
        lx = np.array([p[0] for p in pts])
        ly = np.array([p[1] for p in pts])
        nn = float(len(pts))
        ex = lx - lx.sum() / nn
        ey = ly - ly.sum() / nn
        h = float((ex * ey).sum() / (ex * ex).sum())
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "hurst": pa.array([h], pa.float64()),
        })
        idx = out.column_names.index("hurst")
        return out.set_column(idx, "hurst",
                              round_like_duckdb(out.column("hurst"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "hurst"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_hurst"] = q_daily_revenue_hurst
ORACLE_SQL["q_daily_revenue_hurst"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    o AS (
      SELECT c * 1.0 AS c,
             row_number() OVER (ORDER BY day) - 1 AS i
      FROM d
    ),
    nn AS (SELECT count(*) AS n FROM o),
    sz AS (SELECT unnest([16, 32, 64, 128]) AS s),
    m AS (
      SELECT sz.s AS s, o.i // sz.s AS ch, avg(o.c) AS mu,
             count(*) AS cnt
      FROM o, sz GROUP BY 1, 2
    ),
    dv AS (
      SELECT m.s, m.ch, o.i, o.c - m.mu AS dev
      FROM o JOIN m ON m.ch = o.i // m.s
      WHERE m.cnt = m.s
    ),
    cd AS (
      SELECT s, ch, dev,
             sum(dev) OVER (PARTITION BY s, ch ORDER BY i) AS cd
      FROM dv
    ),
    rs AS (
      SELECT s, ch,
             (max(cd) - min(cd)) / sqrt(avg(dev * dev)) AS rs
      FROM cd GROUP BY 1, 2
      HAVING avg(dev * dev) > 0
    ),
    pt AS (
      SELECT log2(s * 1.0) AS lx, log2(sum(rs) / count(*)) AS ly
      FROM rs GROUP BY s
    ),
    reg AS (
      SELECT count(*) * 1.0 AS k, sum(lx) AS sx, sum(ly) AS sy,
             sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
      FROM pt
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
           round((sxy - sx * sy / k) / (sxx - sx * sx / k), 6) AS hurst
    FROM reg
"""


def q_weekend_price_energy_distance(sf_dir: str):
    """Energy distance between weekend and weekday order values:
    E = 2·E|X−Y| − E|X−X′| − E|Y−Y′| and the normalized coefficient
    E/(2·E|X−Y|) ∈ [0,1] — the metric two-sample test sensitive to ANY
    distribution difference (location, scale, shape), zero iff the
    distributions match.  NEVER forms pairs: one `range_sort` of exact
    integer cents + four exclusive prefix sums turn every pair-sum into
    a per-row x·cnt_before − sum_before fold (tie-order invariant), so
    all three O(n²) expectations are exact int64 in one pass."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        a = pc.add(day, pa.scalar(3, pa.int64()))
        seven = pa.scalar(7, pa.int64())
        dow = pc.add(pc.subtract(a, pc.multiply(
            pc.divide(a, seven), seven)), pa.scalar(1, pa.int64()))
        wk = pc.cast(pc.greater_equal(dow, pa.scalar(6, pa.int64())),
                     pa.int64())
        x = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        one = pa.scalar(1, pa.int64())
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "x": x,
            "iwe": wk, "iwd": pc.subtract(one, wk),
            "xwe": pc.multiply(x, wk),
            "xwd": pc.multiply(x, pc.subtract(one, wk)),
        })

    s = range_sort(ords.map_batches(prep, batch_format="pyarrow"), "x",
                   tiebreak=["o_orderkey"])
    for col, out_name in (("iwe", "__cwe"), ("iwd", "__cwd"),
                          ("xwe", "__swe"), ("xwd", "__swd")):
        s = global_prefix_sums(s, col, out_name=out_name, exclusive=True)

    def contrib(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        iwe = b.column("iwe").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cwe = b.column("__cwe").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cwd = b.column("__cwd").to_numpy(zero_copy_only=False).astype(
            np.int64)
        swe = b.column("__swe").to_numpy(zero_copy_only=False).astype(
            np.int64)
        swd = b.column("__swd").to_numpy(zero_copy_only=False).astype(
            np.int64)
        # opposite-group pairs close at the later element; same-group too
        cross = np.where(iwe == 1, x * cwd - swd, x * cwe - swe)
        within_we = np.where(iwe == 1, x * cwe - swe, 0)
        within_wd = np.where(iwe == 0, x * cwd - swd, 0)
        return _add_g(pa.table({
            "cross": pa.array(cross, pa.int64()),
            "wwe": pa.array(within_we, pa.int64()),
            "wwd": pa.array(within_wd, pa.int64()),
            "iwe": pa.array(iwe, pa.int64()),
            "iwd": pa.array(1 - iwe, pa.int64()),
        }))

    g = grouped_agg(s.map_batches(contrib, batch_format="pyarrow"),
                    ["__g"],
                    [("cross", "cross", "sum"), ("wwe", "wwe", "sum"),
                     ("wwd", "wwd", "sum"), ("nwe", "iwe", "sum"),
                     ("nwd", "iwd", "sum")], sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_weekend": pa.array([], pa.int64()),
            "n_weekday": pa.array([], pa.int64()),
            "energy_distance": pa.array([], pa.float64()),
            "e_coefficient": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        nwe, nwd = int(r["nwe"]), int(r["nwd"])
        if nwe == 0 or nwd == 0:
            return empty
        a = float(r["cross"]) / (float(nwe) * float(nwd))
        bb = 2.0 * float(r["wwe"]) / (float(nwe) * float(nwe))
        cc = 2.0 * float(r["wwd"]) / (float(nwd) * float(nwd))
        e = (2.0 * a - bb - cc) / 100.0
        coef = (2.0 * a - bb - cc) / (2.0 * a) if a > 0.0 else None
        out = pa.table({
            "n_weekend": pa.array([nwe], pa.int64()),
            "n_weekday": pa.array([nwd], pa.int64()),
            "energy_distance": pa.array([e], pa.float64()),
            "e_coefficient": pa.array([coef], pa.float64()),
        })
        for name in ("energy_distance", "e_coefficient"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_weekend", "n_weekday", "energy_distance",
                            "e_coefficient"]),
        batch_format="pyarrow")


QUERIES["q_weekend_price_energy_distance"] = q_weekend_price_energy_distance
ORACLE_SQL["q_weekend_price_energy_distance"] = """
    WITH p AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS x,
             CASE WHEN (epoch_us(o_orderdate) // 86400000000 + 3) % 7
                       + 1 >= 6
                  THEN 1 ELSE 0 END AS iwe
      FROM orders
    ),
    w AS (
      SELECT x, iwe,
             coalesce(sum(iwe) OVER pre, 0) AS cwe,
             coalesce(sum(1 - iwe) OVER pre, 0) AS cwd,
             coalesce(sum(x * iwe) OVER pre, 0) AS swe,
             coalesce(sum(x * (1 - iwe)) OVER pre, 0) AS swd
      FROM p
      WINDOW pre AS (ORDER BY x, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
      SELECT sum(CASE WHEN iwe = 1 THEN x * cwd - swd
                      ELSE x * cwe - swe END) AS cross_s,
             sum(CASE WHEN iwe = 1 THEN x * cwe - swe ELSE 0 END) AS wwe,
             sum(CASE WHEN iwe = 0 THEN x * cwd - swd ELSE 0 END) AS wwd,
             sum(iwe) AS nwe, sum(1 - iwe) AS nwd
      FROM w
    ),
    st AS (
      SELECT nwe, nwd,
             CAST(cross_s AS DOUBLE) / (nwe * 1.0 * nwd) AS a,
             2.0 * CAST(wwe AS DOUBLE) / (nwe * 1.0 * nwe) AS b,
             2.0 * CAST(wwd AS DOUBLE) / (nwd * 1.0 * nwd) AS c
      FROM g
    )
    SELECT CAST(nwe AS BIGINT) AS n_weekend,
           CAST(nwd AS BIGINT) AS n_weekday,
           round((2.0 * a - b - c) / 100.0, 6) AS energy_distance,
           round((2.0 * a - b - c) / (2.0 * a), 6) AS e_coefficient
    FROM st
"""


def q_lang_unigram_jsd_matrix(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between the unigram (word)
    distributions of every language pair — the corpus-mix monitor that
    flags when one source's vocabulary drifts away from the others
    (machine-translated or template spam shows up as a collapsing JSD).
    Per-(lang, word) counts fold in one combiner; the |langs|²·|vocab|
    pair fold is driver-trivial on this corpus and stays so whenever the
    tracked vocabulary is bounded (hash to a fixed slot count first at
    open-vocab scale)."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": pa.array(np.repeat(langs, lens), pa.string()),
            "word": pc.list_flatten(toks),
        })

    c = grouped_agg(docs.map_batches(words, batch_format="pyarrow"),
                    ["lang", "word"], [("n", "word", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "lang_a": pa.array([], pa.string()),
            "lang_b": pa.array([], pa.string()),
            "jsd": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        word = t.column("word").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        langs = np.unique(lang)
        vocab, widx = np.unique(word, return_inverse=True)
        mat = np.zeros((len(langs), len(vocab)))
        lidx = np.searchsorted(langs, lang)
        mat[lidx, widx] = n
        p = mat / mat.sum(axis=1, keepdims=True)
        la_out, lb_out, jsd_out = [], [], []
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                pi, pj = p[i], p[j]
                m = (pi + pj) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    ka = np.where(pi > 0.0, pi * np.log(pi / m), 0.0)
                    kb = np.where(pj > 0.0, pj * np.log(pj / m), 0.0)
                la_out.append(str(langs[i]))
                lb_out.append(str(langs[j]))
                jsd_out.append(float((ka.sum() + kb.sum()) / 2.0))
        out = pa.table({
            "lang_a": pa.array(la_out, pa.string()),
            "lang_b": pa.array(lb_out, pa.string()),
            "jsd": pa.array(jsd_out, pa.float64()),
        })
        idx = out.column_names.index("jsd")
        return out.set_column(idx, "jsd",
                              round_like_duckdb(out.column("jsd"), 6))

    out = grouped_map(c.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["lang_a", "lang_b", "jsd"]),
        batch_format="pyarrow")


QUERIES["q_lang_unigram_jsd_matrix"] = q_lang_unigram_jsd_matrix
ORACLE_SQL["q_lang_unigram_jsd_matrix"] = """
    WITH c AS (
      SELECT lang, w AS word, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1),
    p AS (
      SELECT c.lang, word, n * 1.0 / tot AS p
      FROM c JOIN t ON t.lang = c.lang
    ),
    pairs AS (
      SELECT a.lang AS la, b.lang AS lb
      FROM t a, t b WHERE a.lang < b.lang
    ),
    w AS (SELECT DISTINCT word FROM c),
    grid AS (SELECT la, lb, word FROM pairs, w),
    jj AS (
      SELECT grid.la, grid.lb,
             coalesce(pa.p, 0.0) AS p, coalesce(pb.p, 0.0) AS q
      FROM grid
      LEFT JOIN p pa ON pa.lang = grid.la AND pa.word = grid.word
      LEFT JOIN p pb ON pb.lang = grid.lb AND pb.word = grid.word
    )
    SELECT la AS lang_a, lb AS lang_b,
           round((sum(CASE WHEN p > 0
                           THEN p * ln(p / ((p + q) / 2.0))
                           ELSE 0.0 END)
                  + sum(CASE WHEN q > 0
                             THEN q * ln(q / ((p + q) / 2.0))
                             ELSE 0.0 END)) / 2.0, 6) AS jsd
    FROM jj
    GROUP BY 1, 2
"""


def q_daily_revenue_seasonal_decomposition(sf_dir: str):
    """Classical additive seasonal decomposition of daily revenue:
    trend = centered 7-day moving average, per-weekday seasonal index =
    mean detrended value, and the residual variance share — the
    decomposition behind "is the weekly cycle growing or is it noise?".
    One combiner exchange to the tiny exact-cents daily table; the MA /
    detrend / index passes run vectorized over it (at larger n the MA7
    is the existing distributed windowed mean)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "dow": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "seasonal_index": pa.array([], pa.float64()),
            "residual_var_share": pa.array([], pa.float64()),
        })
        if t.num_rows < 15:
            return empty
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False)
        c = (t.column("c").to_numpy(zero_copy_only=False)
             .astype(np.float64) / 100.0)
        n = len(c)
        # centered MA7 (full windows only), matching AVG OVER ROWS
        # BETWEEN 3 PRECEDING AND 3 FOLLOWING with a count guard
        k = np.convolve(c, np.ones(7), mode="valid") / 7.0
        trend = np.full(n, np.nan)
        trend[3:n - 3] = k
        det = c - trend
        dow = (day + 3) % 7 + 1
        ok = ~np.isnan(det)
        rows = []
        for dd in range(1, 8):
            m = ok & (dow == dd)
            if not m.any():
                continue
            rows.append((dd, int(m.sum()),
                         float(det[m].sum() / m.sum())))
        # residual variance share: Var(det − seasonal) / Var(c) over
        # the trend-covered span
        smap = {d: s for d, _, s in rows}
        res = det[ok] - np.array([smap[int(x)] for x in dow[ok]])
        cc = c[ok]
        def var(v):
            # E[v²] − (E[v])², matching the SQL tree exactly
            nn = float(len(v))
            return (v * v).sum() / nn - (v.sum() / nn) * (v.sum() / nn)
        share = float(var(res) / var(cc)) if var(cc) > 0.0 else None
        out = pa.table({
            "dow": pa.array([r[0] for r in rows], pa.int64()),
            "n_days": pa.array([r[1] for r in rows], pa.int64()),
            "seasonal_index": pa.array([r[2] for r in rows],
                                       pa.float64()),
            "residual_var_share": pa.array([share] * len(rows),
                                           pa.float64()),
        })
        for name in ("seasonal_index", "residual_var_share"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["dow", "n_days", "seasonal_index",
                            "residual_var_share"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_seasonal_decomposition"] = \
    q_daily_revenue_seasonal_decomposition
ORACLE_SQL["q_daily_revenue_seasonal_decomposition"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0
                 AS c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT day, c, (day + 3) % 7 + 1 AS dow,
             avg(c) OVER win AS tr,
             count(*) OVER win AS cnt
      FROM d
      WINDOW win AS (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT dow, c, c - tr AS det FROM w WHERE cnt = 7
    ),
    s AS (
      SELECT dow, count(*) AS n_days,
             sum(det) / count(*) AS seasonal_index
      FROM det GROUP BY 1
    ),
    r AS (
      SELECT det.c, det.det - s.seasonal_index AS res
      FROM det JOIN s ON s.dow = det.dow
    ),
    v AS (
      SELECT (sum(res * res) / count(*)
              - (sum(res) / count(*)) * (sum(res) / count(*)))
             / (sum(c * c) / count(*)
                - (sum(c) / count(*)) * (sum(c) / count(*))) AS share
      FROM r
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n_days AS BIGINT) AS n_days,
           round(seasonal_index, 6) AS seasonal_index,
           round(share, 6) AS residual_var_share
    FROM s, v
    ORDER BY dow
"""


def q_lineitem_mahalanobis_outliers(sf_dir: str):
    """Top-20 multivariate outliers by Mahalanobis distance over
    (quantity, discount%, price$): d² = (v−μ)ᵀΣ⁻¹(v−μ) with the 3×3
    population covariance inverted in closed form (adjugate/det) — the
    joint-anomaly screen that catches "high quantity AND high discount
    AND low price" rows each univariate z-score misses.  All nine moment
    sums are exact int64 on the combiner (HUGEINT in SQL), the inverse
    is a fixed float tree, and the per-row quadratic form is identical
    on both sides, so the round-6 ranking is deterministic."""
    from ..stages.agg import global_topk, grouped_agg, grouped_map, \
        round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        half = pa.scalar(0.5, pa.float64())
        x = pc.cast(pc.floor(pc.add(b.column("l_quantity"), half)),
                    pa.int64())
        z = pc.cast(pc.floor(pc.add(pc.multiply(
            b.column("l_discount"), pa.scalar(100.0, pa.float64())),
            half)), pa.int64())
        y = pc.cast(pc.floor(pc.add(b.column("l_extendedprice"), half)),
                    pa.int64())
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "x": x, "z": z, "y": y,
        })

    rows = li.map_batches(prep, batch_format="pyarrow").materialize()

    def moments(b: pa.Table) -> pa.Table:
        x, z, y = b.column("x"), b.column("z"), b.column("y")
        return _add_g(pa.table({
            "x": x, "z": z, "y": y,
            "xx": pc.multiply(x, x), "zz": pc.multiply(z, z),
            "yy": pc.multiply(y, y), "xz": pc.multiply(x, z),
            "xy": pc.multiply(x, y), "zy": pc.multiply(z, y),
        }))

    mom = _to_table(grouped_agg(
        rows.map_batches(moments, batch_format="pyarrow"), ["__g"],
        [("n", "x", "count"), ("sx", "x", "sum"), ("sz", "z", "sum"),
         ("sy", "y", "sum"), ("sxx", "xx", "sum"), ("szz", "zz", "sum"),
         ("syy", "yy", "sum"), ("sxz", "xz", "sum"),
         ("sxy", "xy", "sum"), ("szy", "zy", "sum")],
        sum_as_float=False))
    if mom.num_rows == 0 or int(mom.column("n")[0].as_py()) < 4:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "l_linenumber": pa.array([], pa.int64()),
            "mahalanobis_d2": pa.array([], pa.float64())}))
    r = mom.to_pylist()[0]
    n = float(r["n"])
    mx, mz, my = (float(r["sx"]) / n, float(r["sz"]) / n,
                  float(r["sy"]) / n)
    cxx = float(r["sxx"]) / n - mx * mx
    czz = float(r["szz"]) / n - mz * mz
    cyy = float(r["syy"]) / n - my * my
    cxz = float(r["sxz"]) / n - mx * mz
    cxy = float(r["sxy"]) / n - mx * my
    czy = float(r["szy"]) / n - mz * my
    det = (cxx * (czz * cyy - czy * czy)
           - cxz * (cxz * cyy - czy * cxy)
           + cxy * (cxz * czy - czz * cxy))
    a11 = (czz * cyy - czy * czy) / det
    a22 = (cxx * cyy - cxy * cxy) / det
    a33 = (cxx * czz - cxz * cxz) / det
    a12 = -(cxz * cyy - czy * cxy) / det
    a13 = (cxz * czy - czz * cxy) / det
    a23 = -(cxx * czy - cxz * cxy) / det

    def score(b: pa.Table) -> pa.Table:
        dx = pc.subtract(pc.cast(b.column("x"), pa.float64()),
                         pa.scalar(mx, pa.float64()))
        dz = pc.subtract(pc.cast(b.column("z"), pa.float64()),
                         pa.scalar(mz, pa.float64()))
        dy = pc.subtract(pc.cast(b.column("y"), pa.float64()),
                         pa.scalar(my, pa.float64()))
        two = pa.scalar(2.0, pa.float64())
        d2 = pc.add(pc.add(pc.add(pc.add(pc.add(
            pc.multiply(pa.scalar(a11, pa.float64()),
                        pc.multiply(dx, dx)),
            pc.multiply(pa.scalar(a22, pa.float64()),
                        pc.multiply(dz, dz))),
            pc.multiply(pa.scalar(a33, pa.float64()),
                        pc.multiply(dy, dy))),
            pc.multiply(pc.multiply(two, pa.scalar(a12, pa.float64())),
                        pc.multiply(dx, dz))),
            pc.multiply(pc.multiply(two, pa.scalar(a13, pa.float64())),
                        pc.multiply(dx, dy))),
            pc.multiply(pc.multiply(two, pa.scalar(a23, pa.float64())),
                        pc.multiply(dz, dy)))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": pc.cast(b.column("l_linenumber"), pa.int64()),
            "mahalanobis_d2": round_like_duckdb(d2, 6),
        })

    scored = rows.map_batches(score, batch_format="pyarrow")
    return global_topk(scored,
                       ["mahalanobis_d2", "l_orderkey", "l_linenumber"],
                       20, descending=[True, False, False])


QUERIES["q_lineitem_mahalanobis_outliers"] = q_lineitem_mahalanobis_outliers
ORACLE_SQL["q_lineitem_mahalanobis_outliers"] = """
    WITH p AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS z,
             CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    g AS (
      SELECT count(*) * 1.0 AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(z) AS DOUBLE) AS sz,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(z * z) AS DOUBLE) AS szz,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * z) AS DOUBLE) AS sxz,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(z * y) AS DOUBLE) AS szy
      FROM p
    ),
    c AS (
      SELECT sx / n AS mx, sz / n AS mz, sy / n AS my,
             sxx / n - (sx / n) * (sx / n) AS cxx,
             szz / n - (sz / n) * (sz / n) AS czz,
             syy / n - (sy / n) * (sy / n) AS cyy,
             sxz / n - (sx / n) * (sz / n) AS cxz,
             sxy / n - (sx / n) * (sy / n) AS cxy,
             szy / n - (sz / n) * (sy / n) AS czy
      FROM g
    ),
    iv AS (
      SELECT mx, mz, my,
             (czz * cyy - czy * czy) / det AS a11,
             (cxx * cyy - cxy * cxy) / det AS a22,
             (cxx * czz - cxz * cxz) / det AS a33,
             -(cxz * cyy - czy * cxy) / det AS a12,
             (cxz * czy - czz * cxy) / det AS a13,
             -(cxx * czy - cxz * cxy) / det AS a23
      FROM (
        SELECT *,
               cxx * (czz * cyy - czy * czy)
               - cxz * (cxz * cyy - czy * cxy)
               + cxy * (cxz * czy - czz * cxy) AS det
        FROM c
      )
    )
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(a11 * ((x - mx) * (x - mx))
                 + a22 * ((z - mz) * (z - mz))
                 + a33 * ((y - my) * (y - my))
                 + 2.0 * a12 * ((x - mx) * (z - mz))
                 + 2.0 * a13 * ((x - mx) * (y - my))
                 + 2.0 * a23 * ((z - mz) * (y - my)), 6)
               AS mahalanobis_d2
    FROM p, iv
    ORDER BY mahalanobis_d2 DESC, l_orderkey, l_linenumber
    LIMIT 20
"""


def q_customer_k_anonymity(sf_dir: str):
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, balance decile): the smallest equivalence
    class, how many classes and customers fall below k=5, and the risky
    share — the privacy gate run before releasing a "pseudonymized"
    extract.  Decile edges are exact global quantiles; class sizes are
    one combiner; the histogram fold is exact integers."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"])
    qs = global_exact_quantiles(
        cust, "c_acctbal",
        [(f"q{i}", i / 10.0) for i in range(1, 10)], round_to=6)
    edges = np.array([qs[f"q{i}"] for i in range(1, 10)])

    def cls(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        dec = np.searchsorted(edges, bal, side="left")
        return pa.table({
            "nat": b.column("c_nationkey"),
            "seg": b.column("c_mktsegment"),
            "dec": pa.array(dec.astype(np.int64)),
        })

    g = grouped_agg(cust.map_batches(cls, batch_format="pyarrow"),
                    ["nat", "seg", "dec"], [("n", "nat", "count")],
                    sum_as_float=False)

    def fold(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        lt5 = pc.cast(pc.less(n, pa.scalar(5, pa.int64())), pa.int64())
        return _add_g(pa.table({
            "n": n, "lt5": lt5,
            "cust_lt5": pc.multiply(lt5, n),
        }))

    t = grouped_agg(g.map_batches(fold, batch_format="pyarrow"), ["__g"],
                    [("n_classes", "n", "count"), ("min_n", "n", "min"),
                     ("classes_lt5", "lt5", "sum"),
                     ("cust_lt5", "cust_lt5", "sum"),
                     ("total", "n", "sum")], sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_classes": pa.array([], pa.int64()),
            "min_class_size": pa.array([], pa.int64()),
            "classes_below_k5": pa.array([], pa.int64()),
            "customers_below_k5": pa.array([], pa.int64()),
            "risky_share": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        total = int(r["total"])
        out = pa.table({
            "n_classes": pa.array([int(r["n_classes"])], pa.int64()),
            "min_class_size": pa.array([int(r["min_n"])], pa.int64()),
            "classes_below_k5": pa.array([int(r["classes_lt5"])],
                                         pa.int64()),
            "customers_below_k5": pa.array([int(r["cust_lt5"])],
                                           pa.int64()),
            "risky_share": pa.array(
                [int(r["cust_lt5"]) * 1.0 / total if total else None],
                pa.float64()),
        })
        idx = out.column_names.index("risky_share")
        return out.set_column(
            idx, "risky_share",
            round_like_duckdb(out.column("risky_share"), 6))

    out = grouped_map(t, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_classes", "min_class_size",
                            "classes_below_k5", "customers_below_k5",
                            "risky_share"]),
        batch_format="pyarrow")


QUERIES["q_customer_k_anonymity"] = q_customer_k_anonymity
ORACLE_SQL["q_customer_k_anonymity"] = """
    WITH e AS (
      SELECT round(quantile_cont(c_acctbal, 0.1), 6) AS q1,
             round(quantile_cont(c_acctbal, 0.2), 6) AS q2,
             round(quantile_cont(c_acctbal, 0.3), 6) AS q3,
             round(quantile_cont(c_acctbal, 0.4), 6) AS q4,
             round(quantile_cont(c_acctbal, 0.5), 6) AS q5,
             round(quantile_cont(c_acctbal, 0.6), 6) AS q6,
             round(quantile_cont(c_acctbal, 0.7), 6) AS q7,
             round(quantile_cont(c_acctbal, 0.8), 6) AS q8,
             round(quantile_cont(c_acctbal, 0.9), 6) AS q9
      FROM customer
    ),
    s AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CASE WHEN c_acctbal > q9 THEN 9 WHEN c_acctbal > q8 THEN 8
                  WHEN c_acctbal > q7 THEN 7 WHEN c_acctbal > q6 THEN 6
                  WHEN c_acctbal > q5 THEN 5 WHEN c_acctbal > q4 THEN 4
                  WHEN c_acctbal > q3 THEN 3 WHEN c_acctbal > q2 THEN 2
                  WHEN c_acctbal > q1 THEN 1 ELSE 0 END AS dec
      FROM customer, e
    ),
    c AS (SELECT nat, seg, dec, count(*) AS n FROM s GROUP BY 1, 2, 3)
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(n) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k5,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS customers_below_k5,
           round(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1.0 / sum(n),
                 6) AS risky_share
    FROM c
"""


def q_customer_l_diversity(sf_dir: str):
    """l-diversity audit: within each (nation, segment) equivalence
    class, how many DISTINCT order priorities do its customers exhibit —
    min l, the count of l=1 classes (sensitive value fully determined by
    the quasi-identifier), and the mean l.  Composable exact
    count-distinct: one (class, priority) dedup combiner, one per-class
    count, one integer fold."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey",
                       columns=["c_nationkey", "c_mktsegment"])
    trip = grouped_agg(j, ["c_nationkey", "c_mktsegment",
                           "o_orderpriority"],
                       [("__n", "o_custkey", "count")])
    l_per = grouped_agg(trip, ["c_nationkey", "c_mktsegment"],
                        [("l", "o_orderpriority", "count")],
                        sum_as_float=False)

    def fold(b: pa.Table) -> pa.Table:
        l = pc.cast(b.column("l"), pa.int64())
        return _add_g(pa.table({
            "l": l,
            "l1": pc.cast(pc.equal(l, pa.scalar(1, pa.int64())),
                          pa.int64()),
        }))

    t = grouped_agg(l_per.map_batches(fold, batch_format="pyarrow"),
                    ["__g"], [("n_classes", "l", "count"),
                              ("min_l", "l", "min"),
                              ("classes_l1", "l1", "sum"),
                              ("sum_l", "l", "sum")], sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_classes": pa.array([], pa.int64()),
            "min_l": pa.array([], pa.int64()),
            "classes_l1": pa.array([], pa.int64()),
            "mean_l": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        r = t.to_pylist()[0]
        nc = int(r["n_classes"])
        out = pa.table({
            "n_classes": pa.array([nc], pa.int64()),
            "min_l": pa.array([int(r["min_l"])], pa.int64()),
            "classes_l1": pa.array([int(r["classes_l1"])], pa.int64()),
            "mean_l": pa.array([int(r["sum_l"]) * 1.0 / nc if nc
                                else None], pa.float64()),
        })
        idx = out.column_names.index("mean_l")
        return out.set_column(idx, "mean_l",
                              round_like_duckdb(out.column("mean_l"), 6))

    out = grouped_map(t, "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_classes", "min_l", "classes_l1",
                            "mean_l"]),
        batch_format="pyarrow")


QUERIES["q_customer_l_diversity"] = q_customer_l_diversity
ORACLE_SQL["q_customer_l_diversity"] = """
    WITH j AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg, o_orderpriority
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    l AS (
      SELECT nat, seg, count(DISTINCT o_orderpriority) AS l
      FROM j GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_l1,
           round(sum(l) * 1.0 / count(*), 6) AS mean_l
    FROM l
"""


def q_doc_simpson_vocab_diversity(sf_dir: str):
    """Simpson's diversity index of the vocabulary per language:
    D = 1 − Σ n_w(n_w−1)/(N(N−1)), the probability two random tokens
    differ — the concentration-robust companion to type-token ratio
    (TTR rewards rare-word padding; Simpson penalizes one word
    dominating).  Per-(lang, word) counts fold in one combiner; D is an
    exact-integer tree."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    docs = _read(sf_dir, "documents", ["lang", "text"])

    def words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": pa.array(np.repeat(langs, lens), pa.string()),
            "word": pc.list_flatten(toks),
        })

    c = grouped_agg(docs.map_batches(words, batch_format="pyarrow"),
                    ["lang", "word"], [("n", "word", "count")],
                    sum_as_float=False)

    def fold(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        return pa.table({
            "lang": b.column("lang"),
            "n": n,
            "nn1": pc.multiply(n, pc.subtract(n, pa.scalar(
                1, pa.int64()))),
        })

    g = grouped_agg(c.map_batches(fold, batch_format="pyarrow"), ["lang"],
                    [("vocab", "n", "count"), ("tok", "n", "sum"),
                     ("s2", "nn1", "sum")], sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        tok = pc.cast(b.column("tok"), pa.float64())
        s2 = pc.cast(b.column("s2"), pa.float64())
        d = pc.subtract(
            pa.scalar(1.0, pa.float64()),
            pc.divide(s2, pc.multiply(
                tok, pc.subtract(tok, pa.scalar(1.0, pa.float64())))))
        return pa.table({
            "lang": b.column("lang"),
            "n_tokens": pc.cast(b.column("tok"), pa.int64()),
            "vocab_size": pc.cast(b.column("vocab"), pa.int64()),
            "simpson_diversity": round_like_duckdb(d, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_doc_simpson_vocab_diversity"] = q_doc_simpson_vocab_diversity
ORACLE_SQL["q_doc_simpson_vocab_diversity"] = """
    WITH c AS (
      SELECT lang, w AS word, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    g AS (
      SELECT lang, count(*) AS vocab, sum(n) AS tok,
             sum(n * (n - 1)) AS s2
      FROM c GROUP BY 1
    )
    SELECT lang, CAST(tok AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab_size,
           round(1.0 - s2 * 1.0 / (tok * 1.0 * (tok * 1.0 - 1.0)), 6)
               AS simpson_diversity
    FROM g
"""


def q_daily_revenue_changepoint(sf_dir: str):
    """Single change-point locator on daily revenue: the day where the
    CUSUM of mean-deviations peaks in absolute value, with the
    standardized statistic max|S_t|/(σ√n) — the level-shift detector run
    before trusting any trend estimate.  The cumulative deviation is one
    sequential pass over the tiny exact-cents daily table, identical op
    order on both sides, so the located day and statistic are
    deterministic."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "change_day": pa.array([], pa.int64()),
            "cusum_stat": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = float(len(c))
        mu = c.sum() / n
        e = c - mu
        s = np.cumsum(e)
        a = np.abs(s)
        var = (e * e).sum() / n
        if var <= 0.0:
            return empty
        i = int(np.argmax(a))  # first max == smallest day on ties
        stat = float(a[i] / (np.sqrt(var) * np.sqrt(n)))
        out = pa.table({
            "change_day": pa.array([int(day[i])], pa.int64()),
            "cusum_stat": pa.array([stat], pa.float64()),
        })
        idx = out.column_names.index("cusum_stat")
        return out.set_column(
            idx, "cusum_stat",
            round_like_duckdb(out.column("cusum_stat"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["change_day", "cusum_stat"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_changepoint"] = q_daily_revenue_changepoint
ORACLE_SQL["q_daily_revenue_changepoint"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT sum(c) / count(*) AS mu, count(*) * 1.0 AS n FROM d
    ),
    e AS (SELECT day, c - mu AS e, n FROM d, m),
    v AS (SELECT sum(e * e) / any_value(n) AS var FROM e),
    cd AS (
      SELECT day, sum(e) OVER (ORDER BY day) AS s, n
      FROM e
    )
    SELECT day AS change_day,
           round(abs(s) / (sqrt(var) * sqrt(n)), 6) AS cusum_stat
    FROM cd, v
    ORDER BY abs(s) DESC, day
    LIMIT 1
"""


def q_user_activity_gini(sf_dir: str):
    """Gini coefficient of per-user event counts — "is engagement spread
    or carried by a heavy-user elite?", the single-number companion to
    the whale curve (q_user_value_concentration).  Per-user counts are
    one keyed combiner; the coefficient rides the segmented rank-formula
    Gini kernel (tie-order invariant)."""
    from ..stages.agg import grouped_agg, grouped_gini

    ev = _read(sf_dir, "events", ["user_id"])
    counts = grouped_agg(ev, ["user_id"], [("n", "user_id", "count")],
                         sum_as_float=False)
    g = counts.map_batches(
        lambda b: _add_g(pa.table({
            "n": pc.cast(b.column("n"), pa.int64())})),
        batch_format="pyarrow")
    out = grouped_gini(g, ["__g"], "n", out_name="gini", round_to=6)
    return out.map_batches(lambda b: b.select(["gini"]),
                           batch_format="pyarrow")


QUERIES["q_user_activity_gini"] = q_user_activity_gini
ORACLE_SQL["q_user_activity_gini"] = """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    r AS (
      SELECT n * 1.0 AS x,
             row_number() OVER (ORDER BY n) AS i,
             count(*) OVER () AS cnt
      FROM c
    )
    SELECT round(2.0 * sum(i * x) / (any_value(cnt) * sum(x))
                 - (any_value(cnt) + 1.0) / any_value(cnt), 6) AS gini
    FROM r
"""


def q_part_type_supplier_hhi(sf_dir: str):
    """Supply-concentration HHI per part type: Σ (supplier revenue
    share)² within each type, plus the effective number of suppliers
    1/HHI — the sourcing-risk screen ("is this category single-source?")
    on exact integer cents.  One (type, supplier) combiner, one
    broadcast of type totals, one share fold."""
    from ..stages.agg import grouped_agg, round_like_duckdb

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = broadcast_join(li, part, left_key="l_partkey",
                       right_key="p_partkey", columns=["p_type"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_type": b.column("p_type"),
            "l_suppkey": b.column("l_suppkey"),
            "c": pc.cast(pc.round(pc.multiply(
                b.column("l_extendedprice"),
                pa.scalar(100.0, pa.float64()))), pa.int64()),
        })

    ts = grouped_agg(j.map_batches(cents, batch_format="pyarrow"),
                     ["p_type", "l_suppkey"], [("c", "c", "sum")],
                     sum_as_float=False).materialize()
    tot = grouped_agg(ts, ["p_type"], [("tot", "c", "sum"),
                                       ("n_supp", "c", "count")],
                      sum_as_float=False)
    jj = broadcast_join(ts, tot, left_key="p_type", right_key="p_type",
                        columns=["tot"])

    def share(b: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(b.column("c"), pa.float64()),
                      pc.cast(b.column("tot"), pa.float64()))
        return pa.table({
            "p_type": b.column("p_type"),
            "s2": pc.multiply(s, s),
        })

    h = grouped_agg(jj.map_batches(share, batch_format="pyarrow"),
                    ["p_type"], [("hhi", "s2", "sum")])
    counts = tot.map_batches(
        lambda b: pa.table({"p_type": b.column("p_type"),
                            "n_suppliers": pc.cast(b.column("n_supp"),
                                                   pa.int64())}),
        batch_format="pyarrow")
    out = broadcast_join(h, counts, left_key="p_type",
                         right_key="p_type", columns=["n_suppliers"])

    def finalize(b: pa.Table) -> pa.Table:
        hhi = b.column("hhi")
        return pa.table({
            "p_type": b.column("p_type"),
            "n_suppliers": b.column("n_suppliers"),
            "hhi": round_like_duckdb(hhi, 6),
            "effective_suppliers": round_like_duckdb(
                pc.divide(pa.scalar(1.0, pa.float64()), hhi), 6),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_part_type_supplier_hhi"] = q_part_type_supplier_hhi
ORACLE_SQL["q_part_type_supplier_hhi"] = """
    WITH ts AS (
      SELECT p_type, l_suppkey,
             sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    t AS (
      SELECT p_type, sum(c) AS tot, count(*) AS n_supp
      FROM ts GROUP BY 1
    ),
    h AS (
      SELECT ts.p_type,
             sum((ts.c * 1.0 / t.tot) * (ts.c * 1.0 / t.tot)) AS hhi,
             any_value(t.n_supp) AS n_supp
      FROM ts JOIN t ON t.p_type = ts.p_type
      GROUP BY 1
    )
    SELECT p_type, CAST(n_supp AS BIGINT) AS n_suppliers,
           round(hhi, 6) AS hhi,
           round(1.0 / hhi, 6) AS effective_suppliers
    FROM h
"""


def q_weekly_dow_page_trend(sf_dir: str):
    """Page's L trend test: does revenue rise monotonically across the
    week (Mon→Sun), treating each complete week as a repeated-measures
    block?  The ordered-alternative refinement of Friedman — L = Σ
    dow·R_dow over within-week ranks, with Page's (1963) normal
    approximation z = (L−n·k(k+1)²/4)/√(n·k²(k+1)²(k−1)/144).  One
    combiner to the exact-cents daily table; ranks are assigned inside
    each week's co-partition run (complete weeks only)."""
    from ..stages.agg import _key_run_bounds, grouped_agg, grouped_map, \
        round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def wk(b: pa.Table) -> pa.Table:
        a = pc.add(b.column("day"), pa.scalar(3, pa.int64()))
        seven = pa.scalar(7, pa.int64())
        week = pc.divide(a, seven)
        dow = pc.add(pc.subtract(a, pc.multiply(week, seven)),
                     pa.scalar(1, pa.int64()))
        return pa.table({"week": week, "dow": dow, "c": b.column("c")})

    d = daily.map_batches(wk, batch_format="pyarrow")

    empty = pa.table({"dow": pa.array([], pa.int64()),
                      "fr": pa.array([], pa.float64())})

    def rank_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("week", "ascending"), ("c", "ascending")])
        bounds = _key_run_bounds(t, ["week"])
        sizes = np.diff(bounds)
        c = t.column("c").to_numpy(zero_copy_only=False)
        fr = np.empty(t.num_rows, np.float64)
        for ri in range(len(sizes)):
            s0, e0 = int(bounds[ri]), int(bounds[ri + 1])
            vv = c[s0:e0]
            lo = np.searchsorted(vv, vv, side="left")
            hi = np.searchsorted(vv, vv, side="right")
            fr[s0:e0] = lo + 1.0 + (hi - lo - 1.0) / 2.0
        keep = np.repeat(sizes == 7, sizes)
        return pa.table({
            "dow": t.column("dow").filter(pa.array(keep)),
            "fr": pa.array(fr[keep], pa.float64()),
        })

    ranked = grouped_map(d, "week", rank_part, per_group=False,
                         empty_schema=pa.table({
                             "week": pa.array([], pa.int64()),
                             "dow": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())}))
    rj = grouped_agg(ranked, ["dow"], [("rj", "fr", "sum"),
                                       ("nw", "fr", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty_out = pa.table({
            "n_weeks": pa.array([], pa.int64()),
            "l_stat": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_columns == 0 or t.num_rows < 7:
            return empty_out
        dow = t.column("dow").to_numpy(zero_copy_only=False).astype(
            np.float64)
        rjs = t.column("rj").to_numpy(zero_copy_only=False)
        n = float(t.column("nw").to_numpy(zero_copy_only=False).max())
        k = 7.0
        if n == 0.0:
            return empty_out
        L = float((dow * rjs).sum())
        mu = n * k * (k + 1.0) * (k + 1.0) / 4.0
        var = (n * k * k * (k + 1.0) * (k + 1.0) * (k - 1.0)) / 144.0
        z = (L - mu) / np.sqrt(var)
        out = pa.table({
            "n_weeks": pa.array([int(n)], pa.int64()),
            "l_stat": pa.array([L], pa.float64()),
            "z": pa.array([float(z)], pa.float64()),
        })
        for name in ("l_stat", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    # the 7-row aggregate folds driver-side and returns the Arrow table
    # itself: an all-empty Ray dataset would drop the typed schema that
    # the sf0.001 "no complete weeks" case still needs to present
    return finalize(_to_table(rj))


QUERIES["q_weekly_dow_page_trend"] = q_weekly_dow_page_trend
ORACLE_SQL["q_weekly_dow_page_trend"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT (day + 3) // 7 AS week, (day + 3) % 7 + 1 AS dow, c
      FROM d
    ),
    fw AS (SELECT week FROM w GROUP BY week HAVING count(*) = 7),
    r AS (
      SELECT dow,
             rank() OVER (PARTITION BY week ORDER BY c)
                 + (count(*) OVER (PARTITION BY week, c) - 1) / 2.0
                 AS fr
      FROM w WHERE week IN (SELECT week FROM fw)
    ),
    rj AS (SELECT dow, sum(fr) AS rj FROM r GROUP BY 1),
    n AS (SELECT count(*) * 1.0 AS n FROM fw)
    SELECT CAST(n AS BIGINT) AS n_weeks,
           round(sum(dow * rj), 6) AS l_stat,
           round((sum(dow * rj) - n * 7.0 * 64.0 / 4.0)
                 / sqrt(n * 49.0 * 64.0 * 6.0 / 144.0), 6) AS z
    FROM rj, n
    GROUP BY n
"""


def q_user_lifetime_km_ci(sf_dir: str):
    """Kaplan-Meier curve with Greenwood 95% confidence bands:
    Var Ŝ(t) = Ŝ²·Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)) — the uncertainty the bare
    curve (q_user_lifetime_km) hides, clipped to [0,1].  The Greenwood
    sum is just ONE MORE inclusive prefix sum riding the same
    `range_sort` machinery as the survival product."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_prefix_sums

    s, total = _user_lifetime_death_table(sf_dir)

    def factor(b: pa.Table) -> pa.Table:
        d = pc.cast(b.column("d_events"), pa.float64())
        n = pc.subtract(pa.scalar(total, pa.float64()),
                        b.column("__before"))
        f = pc.subtract(pa.scalar(1.0, pa.float64()), pc.divide(d, n))
        lnf = pc.if_else(pc.greater(f, pa.scalar(0.0, pa.float64())),
                         pc.ln(pc.max_element_wise(
                             f, pa.scalar(1e-300, pa.float64()))),
                         pa.scalar(0.0, pa.float64()))
        nd = pc.subtract(n, d)
        gw = pc.if_else(pc.greater(nd, pa.scalar(0.0, pa.float64())),
                        pc.divide(d, pc.multiply(n, nd)),
                        pa.scalar(0.0, pa.float64()))
        return pa.table({
            "days": b.column("days"),
            "__f": f, "__lnf": lnf, "__gw": gw,
        })

    s2 = s.map_batches(factor, batch_format="pyarrow")
    s2 = global_prefix_sums(s2, "__lnf", out_name="__lnsum",
                            exclusive=False)
    s2 = global_prefix_sums(s2, "__gw", out_name="__gwsum",
                            exclusive=False)

    def finalize(b: pa.Table) -> pa.Table:
        surv = pc.if_else(
            pc.equal(b.column("__f"), pa.scalar(0.0, pa.float64())),
            pa.scalar(0.0, pa.float64()),
            pc.exp(b.column("__lnsum")))
        se = pc.multiply(surv, pc.sqrt(b.column("__gwsum")))
        margin = pc.multiply(pa.scalar(1.96, pa.float64()), se)
        lo = pc.max_element_wise(pc.subtract(surv, margin),
                                 pa.scalar(0.0, pa.float64()))
        hi = pc.min_element_wise(pc.add(surv, margin),
                                 pa.scalar(1.0, pa.float64()))
        return pa.table({
            "days": b.column("days"),
            "survival": round_like_duckdb(surv, 6),
            "se": round_like_duckdb(se, 6),
            "ci_lo": round_like_duckdb(lo, 6),
            "ci_hi": round_like_duckdb(hi, 6),
        })

    return s2.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_user_lifetime_km_ci"] = q_user_lifetime_km_ci
ORACLE_SQL["q_user_lifetime_km_ci"] = """
    WITH l AS (
        SELECT user_id,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                    // 86400000000 AS BIGINT) AS days
        FROM events GROUP BY user_id
    ),
    t AS (SELECT count(*) * 1.0 AS total FROM l),
    d AS (SELECT days, count(*) AS d_events FROM l GROUP BY days),
    c AS (
        SELECT days, d_events,
               (SELECT total FROM t)
                   - coalesce(sum(d_events) OVER (ORDER BY days
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
        FROM d
    ),
    f AS (
        SELECT days, d_events, n,
               1.0 - d_events * 1.0 / n AS f,
               CASE WHEN n - d_events > 0
                    THEN d_events / (n * (n - d_events))
                    ELSE 0.0 END AS gw
        FROM c
    ),
    s AS (
        SELECT days,
               CASE WHEN f = 0 THEN 0.0
                    ELSE exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0 END)
                             OVER (ORDER BY days))
               END AS surv,
               sum(gw) OVER (ORDER BY days) AS gwsum
        FROM f
    )
    SELECT days,
           round(surv, 6) AS survival,
           round(surv * sqrt(gwsum), 6) AS se,
           round(greatest(surv - 1.96 * (surv * sqrt(gwsum)), 0.0), 6)
               AS ci_lo,
           round(least(surv + 1.96 * (surv * sqrt(gwsum)), 1.0), 6)
               AS ci_hi
    FROM s
"""


def q_priority_value_jonckheere(sf_dir: str):
    """Jonckheere-Terpstra ordered-alternative test: do order values
    trend monotonically with priority level (1-URGENT … 5-LOW)?  J sums
    the between-group Mann-Whitney counts for every ordered pair g<h —
    strictly more powerful than Kruskal-Wallis when the alternative is
    ordered.  NEVER forms pairs: one per-distinct-value pivot (5 level
    counts per value row), a `range_sort` + 5 exclusive prefix sums, and
    2J folds per row as Σ_{g<h} 2·n_h·C_g + n_g·n_h (ties at the same
    value count ½) — all exact int64.  z uses the standard no-tie normal
    approximation (ties here are same-cent collisions only)."""
    from ..stages.agg import grouped_agg, grouped_map, round_like_duckdb
    from ..stages.sort import global_prefix_sums, range_sort

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        pr = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        lvl = np.array([int(p.split("-")[0]) for p in pr], np.int64)
        cols = {"v": v}
        for g in range(1, 6):
            cols[f"i{g}"] = pa.array((lvl == g).astype(np.int64))
        return pa.table(cols)

    piv = grouped_agg(ords.map_batches(prep, batch_format="pyarrow"),
                      ["v"], [(f"n{g}", f"i{g}", "sum")
                              for g in range(1, 6)],
                      sum_as_float=False)
    s = range_sort(piv, "v")
    for g in range(1, 6):
        s = global_prefix_sums(s, f"n{g}", out_name=f"__c{g}",
                               exclusive=True)

    def contrib(b: pa.Table) -> pa.Table:
        n = [b.column(f"n{g}").to_numpy(zero_copy_only=False).astype(
            np.int64) for g in range(1, 6)]
        c = [b.column(f"__c{g}").to_numpy(zero_copy_only=False).astype(
            np.int64) for g in range(1, 6)]
        two_j = np.zeros(b.num_rows, np.int64)
        for g in range(5):
            for h in range(g + 1, 5):
                two_j += 2 * n[h] * c[g] + n[g] * n[h]
        cols = {"two_j": pa.array(two_j, pa.int64())}
        for g in range(1, 6):
            cols[f"n{g}"] = b.column(f"n{g}")
        return _add_g(pa.table(cols))

    t = grouped_agg(s.map_batches(contrib, batch_format="pyarrow"),
                    ["__g"],
                    [("two_j", "two_j", "sum")]
                    + [(f"n{g}", f"n{g}", "sum") for g in range(1, 6)],
                    sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_orders": pa.array([], pa.int64()),
            "j_stat": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        r = t.to_pylist()[0]
        ng = [int(r[f"n{g}"]) for g in range(1, 6)]
        n_tot = sum(ng)
        if n_tot < 3:
            return empty
        j = float(r["two_j"]) / 2.0
        mu = (n_tot * n_tot - sum(x * x for x in ng)) / 4.0
        var = (n_tot * n_tot * (2.0 * n_tot + 3.0)
               - sum(x * x * (2.0 * x + 3.0) for x in ng)) / 72.0
        z = (j - mu) / np.sqrt(var) if var > 0.0 else None
        out = pa.table({
            "n_orders": pa.array([n_tot], pa.int64()),
            "j_stat": pa.array([j], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })
        for name in ("j_stat", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    return finalize(_to_table(t))


QUERIES["q_priority_value_jonckheere"] = q_priority_value_jonckheere
ORACLE_SQL["q_priority_value_jonckheere"] = """
    WITH p AS (
      SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS v,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl
      FROM orders
    ),
    piv AS (
      SELECT v,
             sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS n2,
             sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS n3,
             sum(CASE WHEN lvl = 4 THEN 1 ELSE 0 END) AS n4,
             sum(CASE WHEN lvl = 5 THEN 1 ELSE 0 END) AS n5
      FROM p GROUP BY v
    ),
    w AS (
      SELECT n1, n2, n3, n4, n5,
             coalesce(sum(n1) OVER pre, 0) AS c1,
             coalesce(sum(n2) OVER pre, 0) AS c2,
             coalesce(sum(n3) OVER pre, 0) AS c3,
             coalesce(sum(n4) OVER pre, 0) AS c4,
             coalesce(sum(n5) OVER pre, 0) AS c5
      FROM piv
      WINDOW pre AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
      SELECT sum(2 * n2 * c1 + n1 * n2
                 + 2 * n3 * c1 + n1 * n3
                 + 2 * n4 * c1 + n1 * n4
                 + 2 * n5 * c1 + n1 * n5
                 + 2 * n3 * c2 + n2 * n3
                 + 2 * n4 * c2 + n2 * n4
                 + 2 * n5 * c2 + n2 * n5
                 + 2 * n4 * c3 + n3 * n4
                 + 2 * n5 * c3 + n3 * n5
                 + 2 * n5 * c4 + n4 * n5) AS two_j,
             sum(n1) AS n1, sum(n2) AS n2, sum(n3) AS n3,
             sum(n4) AS n4, sum(n5) AS n5
      FROM w
    ),
    st AS (
      SELECT two_j / 2.0 AS j,
             n1 + n2 + n3 + n4 + n5 AS nt,
             n1, n2, n3, n4, n5
      FROM g
    )
    SELECT CAST(nt AS BIGINT) AS n_orders,
           round(j, 6) AS j_stat,
           round((j - (nt * nt
                       - (n1 * n1 + n2 * n2 + n3 * n3 + n4 * n4
                          + n5 * n5)) / 4.0)
                 / sqrt((nt * nt * (2.0 * nt + 3.0)
                         - (n1 * n1 * (2.0 * n1 + 3.0)
                            + n2 * n2 * (2.0 * n2 + 3.0)
                            + n3 * n3 * (2.0 * n3 + 3.0)
                            + n4 * n4 * (2.0 * n4 + 3.0)
                            + n5 * n5 * (2.0 * n5 + 3.0))) / 72.0), 6)
               AS z
    FROM st
"""


def _weekend_value_edf_grid(sf_dir: str):
    """Two-sample EDF grid over exact cent values: one row per distinct
    event-value cent ``v`` with weekday/weekend counts (``n_wd`` /
    ``n_we``), globally ``range_sort``-ordered, plus inclusive cumulative
    counts (``c_wd`` / ``c_we``) — the shared spine of the EDF-distance
    family (Wasserstein-1, Kolmogorov-Smirnov, Cramér-von Mises,
    Anderson-Darling).  Raw rows collapse to the distinct-value pivot
    map-side (one combiner exchange); the CDFs are O(blocks)-driver
    prefix sums; raw events are touched exactly once.  Returns
    ``(grid_ds, n_weekday, n_weekend)``."""
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        we = pc.greater_equal(dow, pa.scalar(6, pa.int64()))
        v = pc.cast(pc.round(pc.multiply(
            b.column("value"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "v": v,
            "i_wd": pc.if_else(we, zero, one),
            "i_we": pc.if_else(we, one, zero),
        })

    piv = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                      ["v"], [("n_wd", "i_wd", "sum"),
                              ("n_we", "i_we", "sum")],
                      sum_as_float=False)
    s = range_sort(piv, "v")
    s = global_prefix_sums(s, "n_wd", out_name="c_wd", exclusive=False)
    s = global_prefix_sums(s, "n_we", out_name="c_we", exclusive=False)
    tot = _to_table(grouped_agg(
        s.map_batches(_add_g, batch_format="pyarrow"), ["__g"],
        [("n1", "n_wd", "sum"), ("n2", "n_we", "sum")],
        sum_as_float=False))
    n1 = int(tot.column("n1")[0].as_py()) if tot.num_rows else 0
    n2 = int(tot.column("n2")[0].as_py()) if tot.num_rows else 0
    return s, n1, n2


# Shared SQL preamble of the EDF-distance family: the same distinct-cent
# grid + running CDF counts the Ray side builds (c_wd/c_we inclusive).
_EDF_GRID_SQL = """
    WITH p AS (
      SELECT CAST(round(value * 100.0) AS BIGINT) AS v,
             CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1 ELSE 0 END AS we
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT v, sum(1 - we) AS n_wd, sum(we) AS n_we FROM p GROUP BY v
    ),
    c AS (
      SELECT v, n_wd, n_we,
             sum(n_wd) OVER w AS c_wd,
             sum(n_we) OVER w AS c_we,
             lead(v) OVER (ORDER BY v) AS v_next
      FROM g WINDOW w AS (ORDER BY v)
    ),
    t AS (
      SELECT sum(n_wd) * 1.0 AS n1, sum(n_we) * 1.0 AS n2 FROM g
    )
"""


def q_weekend_value_wasserstein(sf_dir: str):
    """Exact 1-Wasserstein (earth-mover) distance between the weekday
    and weekend event-value distributions, in dollars: W₁ = ∫|F_wd −
    F_we| dx evaluated exactly on the distinct-cent grid as
    Σᵢ |F_wd(vᵢ) − F_we(vᵢ)|·(vᵢ₊₁ − vᵢ)/100.  Completes the
    distribution-distance family (Hellinger/JSD bucket into deciles;
    energy distance sees E|X−Y| moments) with the metric that reads in
    value UNITS — "the weekend distribution sits $X of mass-transport
    away".  The neighbor gap comes from the new cross-block
    `global_shift` lead — no self-join, no window shuffle; CDFs are
    O(blocks)-driver prefix sums on the shared EDF spine."""
    from ..stages.agg import round_like_duckdb
    from ..stages.sort import global_shift

    s, n1, n2 = _weekend_value_edf_grid(sf_dir)
    empty = pa.table({
        "n_weekday": pa.array([], pa.int64()),
        "n_weekend": pa.array([], pa.int64()),
        "w1": pa.array([], pa.float64()),
    })
    if n1 == 0 or n2 == 0:
        return empty
    s = global_shift(s, "v", out_name="v_next", lead=True)

    def contrib(b: pa.Table) -> pa.Table:
        f1 = pc.divide(b.column("c_wd"), pa.scalar(float(n1), pa.float64()))
        f2 = pc.divide(b.column("c_we"), pa.scalar(float(n2), pa.float64()))
        d = pc.abs(pc.subtract(f1, f2))
        gap = pc.cast(pc.subtract(
            pc.coalesce(b.column("v_next"), b.column("v")),
            b.column("v")), pa.float64())
        w = pc.multiply(d, pc.divide(gap, pa.scalar(100.0, pa.float64())))
        return _add_g(pa.table({"w1p": w}))

    t = _to_table(grouped_agg(
        s.map_batches(contrib, batch_format="pyarrow"), ["__g"],
        [("w1", "w1p", "sum")]))
    if t.num_rows == 0:
        return empty
    w1 = float(t.column("w1")[0].as_py())
    out = pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "w1": pa.array([w1], pa.float64()),
    })
    return out.set_column(2, "w1", round_like_duckdb(out.column("w1"), 6))


QUERIES["q_weekend_value_wasserstein"] = q_weekend_value_wasserstein
ORACLE_SQL["q_weekend_value_wasserstein"] = _EDF_GRID_SQL + """
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_weekday,
           CAST((SELECT n2 FROM t) AS BIGINT) AS n_weekend,
           round(sum(abs(c_wd / (SELECT n1 FROM t)
                         - c_we / (SELECT n2 FROM t))
                     * (coalesce(v_next, v) - v) / 100.0), 6) AS w1
    FROM c
"""


def q_weekend_value_ks(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov test weekday vs weekend event
    value: D = max|F_wd − F_we| over the pooled support, the value
    location where the maximum is first attained, and the scaled
    statistic z = D·√(n₁n₂/(n₁+n₂)).  The deviation is kept as the EXACT
    integer |c_wd·n₂ − c_we·n₁| (counts cross-multiplied, no float CDF
    compare), so the max and its argmin-v are bit-exact; two tiny folds
    over the shared EDF grid — raw events touched once."""
    from ..stages.agg import round_like_duckdb

    s, n1, n2 = _weekend_value_edf_grid(sf_dir)
    empty = pa.table({
        "n_weekday": pa.array([], pa.int64()),
        "n_weekend": pa.array([], pa.int64()),
        "ks_d": pa.array([], pa.float64()),
        "v_at": pa.array([], pa.float64()),
        "ks_z": pa.array([], pa.float64()),
    })
    if n1 == 0 or n2 == 0:
        return empty

    def dev(b: pa.Table) -> pa.Table:
        c1 = pc.cast(b.column("c_wd"), pa.int64())
        c2 = pc.cast(b.column("c_we"), pa.int64())
        d = pc.abs(pc.subtract(
            pc.multiply(c1, pa.scalar(n2, pa.int64())),
            pc.multiply(c2, pa.scalar(n1, pa.int64()))))
        return _add_g(pa.table({"v": b.column("v"), "d_num": d}))

    grid2 = s.map_batches(dev, batch_format="pyarrow")
    mx = _to_table(grouped_agg(grid2, ["__g"],
                               [("max_dnum", "d_num", "max")],
                               sum_as_float=False))
    if mx.num_rows == 0:
        return empty
    md = int(mx.column("max_dnum")[0].as_py())

    def at_max(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b.column("d_num"),
                                 pa.scalar(md, pa.int64())))
        return pa.table({"v": keep.column("v"),
                         "__g": keep.column("__g")})

    loc = _to_table(grouped_agg(
        grid2.map_batches(at_max, batch_format="pyarrow"), ["__g"],
        [("v_at", "v", "min")], sum_as_float=False))
    v_at = float(loc.column("v_at")[0].as_py()) / 100.0
    ks_d = md / (float(n1) * float(n2))
    ks_z = ks_d * float(np.sqrt(float(n1) * float(n2) / (n1 + n2)))
    out = pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "ks_d": pa.array([ks_d], pa.float64()),
        "v_at": pa.array([v_at], pa.float64()),
        "ks_z": pa.array([ks_z], pa.float64()),
    })
    for name in ("ks_d", "v_at", "ks_z"):
        idx = out.column_names.index(name)
        out = out.set_column(idx, name,
                             round_like_duckdb(out.column(name), 6))
    return out


QUERIES["q_weekend_value_ks"] = q_weekend_value_ks
ORACLE_SQL["q_weekend_value_ks"] = _EDF_GRID_SQL + """,
    d AS (
      SELECT v,
             abs(c_wd * CAST((SELECT n2 FROM t) AS BIGINT)
                 - c_we * CAST((SELECT n1 FROM t) AS BIGINT)) AS d_num
      FROM c
    ),
    m AS (SELECT max(d_num) AS md FROM d)
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_weekday,
           CAST((SELECT n2 FROM t) AS BIGINT) AS n_weekend,
           round((SELECT md FROM m)
                 / ((SELECT n1 FROM t) * (SELECT n2 FROM t)), 6) AS ks_d,
           round(min(v) / 100.0, 6) AS v_at,
           round((SELECT md FROM m)
                 / ((SELECT n1 FROM t) * (SELECT n2 FROM t))
                 * sqrt((SELECT n1 FROM t) * (SELECT n2 FROM t)
                        / ((SELECT n1 FROM t) + (SELECT n2 FROM t))), 6)
               AS ks_z
    FROM d WHERE d_num = (SELECT md FROM m)
"""


def q_weekend_value_cvm(sf_dir: str):
    """Two-sample Cramér-von Mises statistic weekday vs weekend event
    value, tie-adjusted via the pooled EDF: T = (n₁n₂/N²)·Σᵢ cntᵢ·(F_wd(vᵢ)
    − F_we(vᵢ))², i.e. (n₁n₂/N)·∫(F₁−F₂)² dH_N with H_N the pooled EDF —
    the L²-norm companion to KS's L∞ (sensitive to distributed
    differences, not just the single worst point).  One fold over the
    shared EDF grid."""
    from ..stages.agg import round_like_duckdb

    s, n1, n2 = _weekend_value_edf_grid(sf_dir)
    empty = pa.table({
        "n_weekday": pa.array([], pa.int64()),
        "n_weekend": pa.array([], pa.int64()),
        "t_stat": pa.array([], pa.float64()),
    })
    if n1 == 0 or n2 == 0:
        return empty
    nn = float(n1 + n2)

    def contrib(b: pa.Table) -> pa.Table:
        f1 = pc.divide(b.column("c_wd"), pa.scalar(float(n1), pa.float64()))
        f2 = pc.divide(b.column("c_we"), pa.scalar(float(n2), pa.float64()))
        d = pc.subtract(f1, f2)
        cnt = pc.cast(pc.add(b.column("n_wd"), b.column("n_we")),
                      pa.float64())
        w = pc.multiply(cnt, pc.multiply(d, d))
        return _add_g(pa.table({"tp": w}))

    t = _to_table(grouped_agg(
        s.map_batches(contrib, batch_format="pyarrow"), ["__g"],
        [("tsum", "tp", "sum")]))
    if t.num_rows == 0:
        return empty
    tstat = float(n1) * float(n2) / (nn * nn) * float(
        t.column("tsum")[0].as_py())
    out = pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "t_stat": pa.array([tstat], pa.float64()),
    })
    return out.set_column(2, "t_stat",
                          round_like_duckdb(out.column("t_stat"), 6))


QUERIES["q_weekend_value_cvm"] = q_weekend_value_cvm
ORACLE_SQL["q_weekend_value_cvm"] = _EDF_GRID_SQL + """
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_weekday,
           CAST((SELECT n2 FROM t) AS BIGINT) AS n_weekend,
           round((SELECT n1 FROM t) * (SELECT n2 FROM t)
                 / pow((SELECT n1 FROM t) + (SELECT n2 FROM t), 2)
                 * sum((n_wd + n_we)
                       * pow(c_wd / (SELECT n1 FROM t)
                             - c_we / (SELECT n2 FROM t), 2)), 6)
               AS t_stat
    FROM c
"""


def q_weekend_value_anderson_darling(sf_dir: str):
    """Two-sample Anderson-Darling statistic weekday vs weekend event
    value (Scholz-Stephens k-sample A²ₖₙ at k=2, tie form over distinct
    values): A² = Σⱼ (1/nⱼ)·Σ_{i: Cᵢ<N} (cntᵢ/N)·(N·cⱼᵢ − nⱼ·Cᵢ)² /
    (Cᵢ·(N−Cᵢ)) — the tail-weighted EDF distance (the 1/(C(N−C)) weight
    blows up at the extremes, where KS and CvM are blind).  One fold
    over the shared EDF grid; the Cᵢ=N last row drops out exactly as in
    the textbook definition."""
    from ..stages.agg import round_like_duckdb

    s, n1, n2 = _weekend_value_edf_grid(sf_dir)
    empty = pa.table({
        "n_weekday": pa.array([], pa.int64()),
        "n_weekend": pa.array([], pa.int64()),
        "a2_stat": pa.array([], pa.float64()),
    })
    if n1 == 0 or n2 == 0:
        return empty
    nn = float(n1 + n2)

    def contrib(b: pa.Table) -> pa.Table:
        c1 = b.column("c_wd").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c2 = b.column("c_we").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cnt = (b.column("n_wd").to_numpy(zero_copy_only=False)
               + b.column("n_we").to_numpy(zero_copy_only=False)).astype(
            np.float64)
        big = c1 + c2
        denom = big * (nn - big)
        ok = denom > 0.0
        term = np.zeros(len(c1), np.float64)
        for nj, cj in ((float(n1), c1), (float(n2), c2)):
            num = (nn * cj - nj * big) ** 2
            term[ok] += (cnt[ok] / nn) * num[ok] / denom[ok] / nj
        return _add_g(pa.table({"ap": pa.array(term, pa.float64())}))

    t = _to_table(grouped_agg(
        s.map_batches(contrib, batch_format="pyarrow"), ["__g"],
        [("a2", "ap", "sum")]))
    if t.num_rows == 0:
        return empty
    out = pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "a2_stat": pa.array([float(t.column("a2")[0].as_py())],
                            pa.float64()),
    })
    return out.set_column(2, "a2_stat",
                          round_like_duckdb(out.column("a2_stat"), 6))


QUERIES["q_weekend_value_anderson_darling"] = q_weekend_value_anderson_darling
ORACLE_SQL["q_weekend_value_anderson_darling"] = _EDF_GRID_SQL + """
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_weekday,
           CAST((SELECT n2 FROM t) AS BIGINT) AS n_weekend,
           round(sum(CASE WHEN (c_wd + c_we)
                              * ((SELECT n1 FROM t) + (SELECT n2 FROM t)
                                 - c_wd - c_we) > 0
                 THEN ((n_wd + n_we)
                       / ((SELECT n1 FROM t) + (SELECT n2 FROM t)))
                      * (pow(((SELECT n1 FROM t) + (SELECT n2 FROM t))
                                 * c_wd
                             - (SELECT n1 FROM t) * (c_wd + c_we), 2)
                             / (SELECT n1 FROM t)
                         + pow(((SELECT n1 FROM t) + (SELECT n2 FROM t))
                                   * c_we
                               - (SELECT n2 FROM t) * (c_wd + c_we), 2)
                             / (SELECT n2 FROM t))
                      / ((c_wd + c_we)
                         * ((SELECT n1 FROM t) + (SELECT n2 FROM t)
                            - c_wd - c_we))
                 ELSE 0.0 END), 6) AS a2_stat
    FROM c
"""


def q_daily_revenue_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test on daily revenue: S = Σ_{i<j}
    sign(cⱼ − cᵢ) over the day-sorted exact-cent series, tie-corrected
    variance Var = [n(n−1)(2n+5) − Σₜ t(t−1)(2t+5)]/18, the
    continuity-corrected z, and Kendall's τ_b effect size — the
    distribution-free monotone-trend screen (no linearity or normality
    assumption, robust to outliers) complementing the parametric DF/OLS
    trend tools on the same series.  One combiner exchange collapses
    orders to the ≤calendar-length daily table; S and the tie spectrum
    are exact integers from a vectorized pairwise sign count in the
    single-group finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "s_stat": pa.array([], pa.int64()),
            "tau_b": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        t = t.sort_by([("day", "ascending")])
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(c)
        diff = np.sign(c[None, :] - c[:, None])
        s = int(np.triu(diff, 1).sum())
        _, counts = np.unique(c, return_counts=True)
        tie = counts[counts > 1].astype(np.float64)
        var = (n * (n - 1.0) * (2.0 * n + 5.0)
               - float((tie * (tie - 1.0) * (2.0 * tie + 5.0)).sum())) / 18.0
        n0 = n * (n - 1.0) / 2.0
        n1 = float((tie * (tie - 1.0) / 2.0).sum())
        denom = np.sqrt(n0 * (n0 - n1))  # days are distinct: no x-ties
        tau_b = s / denom if denom > 0.0 else None
        if var > 0.0:
            z = ((s - 1.0) / np.sqrt(var) if s > 0
                 else (s + 1.0) / np.sqrt(var) if s < 0 else 0.0)
        else:
            z = None
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "tau_b": pa.array([tau_b], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })
        for name in ("tau_b", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "s_stat", "tau_b", "z"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_mann_kendall"] = q_daily_revenue_mann_kendall
ORACLE_SQL["q_daily_revenue_mann_kendall"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT sum(CASE WHEN b.c > a.c THEN 1
                      WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat
      FROM d a JOIN d b ON b.day > a.day
    ),
    nn AS (SELECT count(*) * 1.0 AS n FROM d),
    ties AS (
      SELECT coalesce(sum(t * (t - 1.0) * (2.0 * t + 5.0)), 0.0) AS tsum,
             coalesce(sum(t * (t - 1.0) / 2.0), 0.0) AS n1
      FROM (SELECT count(*) * 1.0 AS t FROM d GROUP BY c HAVING count(*) > 1)
    ),
    v AS (
      SELECT (n * (n - 1.0) * (2.0 * n + 5.0) - tsum) / 18.0 AS var,
             n * (n - 1.0) / 2.0 AS n0, n1, n
      FROM nn, ties
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           round(s_stat / sqrt(n0 * (n0 - n1)), 6) AS tau_b,
           round(CASE WHEN var <= 0 THEN NULL
                      WHEN s_stat > 0 THEN (s_stat - 1.0) / sqrt(var)
                      WHEN s_stat < 0 THEN (s_stat + 1.0) / sqrt(var)
                      ELSE 0.0 END, 6) AS z
    FROM s, v
"""


def q_daily_revenue_theil_sen(sf_dir: str):
    """Theil-Sen robust trend line of daily revenue: slope = median of
    all pairwise slopes (cⱼ−cᵢ)/(dayⱼ−dayᵢ) in dollars/day, intercept =
    median(yᵢ − slope·dayᵢ) — the median-based regression that tolerates
    up to ~29% outlier days where OLS is dragged arbitrarily far.  The
    daily table is calendar-bounded, so the O(n²) pairwise slopes happen
    once in the single-group finalize; raw orders are touched exactly
    once by the combiner."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "slope": pa.array([], pa.float64()),
            "intercept": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        day = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64) / 100.0
        i, j = np.triu_indices(len(day), k=1)
        slopes = (y[j] - y[i]) / (day[j] - day[i])
        slope = float(np.median(slopes))
        intercept = float(np.median(y - slope * day))
        out = pa.table({
            "n_days": pa.array([len(day)], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
            "intercept": pa.array([intercept], pa.float64()),
        })
        for name in ("slope", "intercept"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "slope", "intercept"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_theil_sen"] = q_daily_revenue_theil_sen
ORACLE_SQL["q_daily_revenue_theil_sen"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y
      FROM orders GROUP BY 1
    ),
    sl AS (
      SELECT quantile_cont((b.y - a.y) / (b.day - a.day), 0.5) AS slope
      FROM d a JOIN d b ON b.day > a.day
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           round(slope, 6) AS slope,
           round((SELECT quantile_cont(y - sl.slope * day, 0.5) FROM d), 6)
               AS intercept
    FROM sl
"""


def q_daily_revenue_durbin_watson(sf_dir: str):
    """Durbin-Watson residual-autocorrelation screen on the daily-revenue
    trend fit: OLS of revenue on day index, then DW = Σ(eₜ−eₜ₋₁)²/Σeₜ²
    over the day-ordered residuals — ≈2 when residuals are independent,
    →0 under positive serial correlation (the classic "your trend-line
    standard errors are lies" gate before trusting the OLS t-stats).
    Companion to Ljung-Box (which tests the raw series): DW tests the
    residuals of the fit."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "dw_stat": pa.array([], pa.float64()),
            "resid_rho1": pa.array([], pa.float64()),
        })
        if t.num_rows < 3:
            return empty
        t = t.sort_by([("day", "ascending")])
        x = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64) / 100.0
        n = float(len(x))
        ex = x - x.sum() / n
        ey = y - y.sum() / n
        sxx = (ex * ex).sum()
        if sxx <= 0.0:
            return empty
        slope = (ex * ey).sum() / sxx
        e = ey - slope * ex
        sse = (e * e).sum()
        if sse <= 0.0:
            return empty
        dw = float(((e[1:] - e[:-1]) ** 2).sum() / sse)
        rho1 = float((e[1:] * e[:-1]).sum() / sse)
        out = pa.table({
            "n_days": pa.array([int(n)], pa.int64()),
            "dw_stat": pa.array([dw], pa.float64()),
            "resid_rho1": pa.array([rho1], pa.float64()),
        })
        for name in ("dw_stat", "resid_rho1"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "dw_stat", "resid_rho1"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_durbin_watson"] = q_daily_revenue_durbin_watson
ORACLE_SQL["q_daily_revenue_durbin_watson"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y
      FROM orders GROUP BY 1
    ),
    f AS (
      SELECT regr_slope(y, day) AS b1, avg(day) AS mx, avg(y) AS my,
             count(*) AS n
      FROM d
    ),
    e AS (
      SELECT day, (y - my) - b1 * (day - mx) AS e
      FROM d, f
    ),
    w AS (
      SELECT e, e - lag(e) OVER (ORDER BY day) AS de
      FROM e
    ),
    l AS (
      SELECT e, e * lag(e) OVER (ORDER BY day) AS ee
      FROM e
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM f) AS n_days,
           round((SELECT sum(de * de) FROM w) / sum(e * e), 6) AS dw_stat,
           round((SELECT sum(ee) FROM l) / sum(e * e), 6) AS resid_rho1
    FROM e
"""


def q_daily_revenue_chow(sf_dir: str):
    """Chow structural-break test on the daily-revenue trend: split the
    day-ordered series at its midpoint row, fit OLS (intercept + day)
    full and per half, and F = ((SSR_full − SSR₁ − SSR₂)/2) /
    ((SSR₁+SSR₂)/(n−4)) — "did the revenue trend CHANGE partway through
    the window?", the regression-regime twin of the CUSUM locator.  All
    three fits come from centered sums over the tiny calendar-bounded
    daily table in the single-group finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def _ssr(x: np.ndarray, y: np.ndarray) -> float:
        n = float(len(x))
        ex = x - x.sum() / n
        ey = y - y.sum() / n
        sxx = (ex * ex).sum()
        if sxx <= 0.0:
            return float((ey * ey).sum())
        return float((ey * ey).sum() - ((ex * ey).sum()) ** 2 / sxx)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "break_day": pa.array([], pa.int64()),
            "f_stat": pa.array([], pa.float64()),
        })
        if t.num_rows < 8:
            return empty
        t = t.sort_by([("day", "ascending")])
        x = t.column("day").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64) / 100.0
        n = len(x)
        h = n // 2
        ssr_f = _ssr(x, y)
        ssr_1 = _ssr(x[:h], y[:h])
        ssr_2 = _ssr(x[h:], y[h:])
        pooled = ssr_1 + ssr_2
        f = (((ssr_f - pooled) / 2.0) / (pooled / (n - 4.0))
             if pooled > 0.0 else None)
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "break_day": pa.array([int(x[h])], pa.int64()),
            "f_stat": pa.array([f], pa.float64()),
        })
        idx = out.column_names.index("f_stat")
        return out.set_column(
            idx, "f_stat", round_like_duckdb(out.column("f_stat"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "break_day", "f_stat"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_chow"] = q_daily_revenue_chow
ORACLE_SQL["q_daily_revenue_chow"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y,
             row_number() OVER (ORDER BY
                 CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT))
                 AS rn
      FROM orders GROUP BY o_orderdate
    ),
    nn AS (SELECT count(*) AS n, count(*) // 2 AS h FROM d),
    seg AS (
      SELECT CASE WHEN rn <= (SELECT h FROM nn) THEN 1 ELSE 2 END AS s,
             day * 1.0 AS x, y
      FROM d
    ),
    parts AS (
      SELECT s, regr_syy(y, x) - pow(regr_sxy(y, x), 2) / regr_sxx(y, x)
                 AS ssr
      FROM seg GROUP BY s
    ),
    full_fit AS (
      SELECT regr_syy(y, x) - pow(regr_sxy(y, x), 2) / regr_sxx(y, x)
                 AS ssr_f
      FROM (SELECT day * 1.0 AS x, y FROM d)
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_days,
           (SELECT CAST(day AS BIGINT) FROM d
            WHERE rn = (SELECT h FROM nn) + 1) AS break_day,
           round(((SELECT ssr_f FROM full_fit) - sum(ssr)) / 2.0
                 / (sum(ssr) / ((SELECT n FROM nn) - 4.0)), 6) AS f_stat
    FROM parts
"""


def q_priority_weekend_trend(sf_dir: str):
    """Cochran-Armitage trend test: does the WEEKEND-placement share of
    orders trend monotonically across the five ordered priority levels
    (scores wᵢ = 1…5)?  The ordered-exposure × binary-outcome screen —
    strictly more powerful than the omnibus chi-square when the
    alternative is a dose-response trend.  z² = [Σwᵢ(rᵢ−nᵢp̄)]² /
    [p̄(1−p̄)·(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N)] from one 5×2 contingency combiner
    over orders — exact integer cells, single pass."""
    from ..stages.agg import grouped_map, round_like_duckdb

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        we = pc.cast(pc.greater_equal(dow, pa.scalar(6, pa.int64())),
                     pa.int64())
        pr = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        lvl = np.array([int(p.split("-")[0]) for p in pr], np.int64)
        return pa.table({"lvl": pa.array(lvl), "we": we})

    cells = grouped_agg(ords.map_batches(prep, batch_format="pyarrow"),
                        ["lvl"], [("n_i", "lvl", "count"),
                                  ("r_i", "we", "sum")],
                        sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_orders": pa.array([], pa.int64()),
            "weekend_share": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        w = t.column("lvl").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n_i = t.column("n_i").to_numpy(zero_copy_only=False).astype(
            np.float64)
        r_i = t.column("r_i").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nt = n_i.sum()
        pbar = r_i.sum() / nt
        num = float((w * (r_i - n_i * pbar)).sum())
        den = pbar * (1.0 - pbar) * (
            float((w * w * n_i).sum()) - float((w * n_i).sum()) ** 2 / nt)
        z = num / np.sqrt(den) if den > 0.0 else None
        out = pa.table({
            "n_orders": pa.array([int(nt)], pa.int64()),
            "weekend_share": pa.array([pbar], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })
        for name in ("weekend_share", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(cells.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_orders", "weekend_share", "z"]),
        batch_format="pyarrow")


QUERIES["q_priority_weekend_trend"] = q_priority_weekend_trend
ORACLE_SQL["q_priority_weekend_trend"] = """
    WITH p AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
             CASE WHEN (epoch_us(o_orderdate) // 86400000000 + 3) % 7 + 1
                       >= 6 THEN 1 ELSE 0 END AS we
      FROM orders
    ),
    g AS (
      SELECT lvl * 1.0 AS w, count(*) * 1.0 AS n_i, sum(we) * 1.0 AS r_i
      FROM p GROUP BY lvl
    ),
    t AS (
      SELECT sum(n_i) AS nt, sum(r_i) / sum(n_i) AS pbar,
             sum(w * n_i) AS swn, sum(w * w * n_i) AS swwn
      FROM g
    )
    SELECT CAST(nt AS BIGINT) AS n_orders,
           round(pbar, 6) AS weekend_share,
           round((SELECT sum(w * (r_i - n_i * pbar)) FROM g, t)
                 / sqrt(pbar * (1.0 - pbar) * (swwn - swn * swn / nt)), 6)
               AS z
    FROM t
"""


def q_segment_priority_gtest(sf_dir: str):
    """G-test (likelihood-ratio chi-square) of independence for market
    segment × order priority: G = 2·Σ O·ln(O/E) over the same
    contingency cells as q_segment_priority_chi2 — the
    information-theoretic twin (G = 2N·MI in nats), additive across
    table partitions where Pearson's χ² is not.  Zero cells contribute
    exactly 0.  One contingency combiner + a tiny cross-join finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, left_key="o_custkey",
                       right_key="c_custkey", columns=["c_mktsegment"])
    cells = grouped_agg(j, ["c_mktsegment", "o_orderpriority"],
                        [("n", "o_orderpriority", "count")],
                        sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "g_stat": pa.array([], pa.float64()),
            "df": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        piv = df.pivot_table(index="c_mktsegment",
                             columns="o_orderpriority", values="n",
                             aggfunc="sum", fill_value=0).to_numpy(
            dtype=np.float64)
        total = piv.sum()
        e = piv.sum(axis=1, keepdims=True) * piv.sum(axis=0,
                                                     keepdims=True) / total
        mask = piv > 0
        g = 2.0 * float((piv[mask] * np.log(piv[mask] / e[mask])).sum())
        dof = (piv.shape[0] - 1) * (piv.shape[1] - 1)
        out = pa.table({
            "g_stat": pa.array([g], pa.float64()),
            "df": pa.array([dof], pa.int64()),
        })
        return out.set_column(0, "g_stat",
                              round_like_duckdb(out.column("g_stat"), 6))

    out = grouped_map(cells.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(lambda b: b.select(["g_stat", "df"]),
                           batch_format="pyarrow")


QUERIES["q_segment_priority_gtest"] = q_segment_priority_gtest
ORACLE_SQL["q_segment_priority_gtest"] = """
    WITH j AS (
      SELECT c_mktsegment AS x, o_orderpriority AS y, count(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY x, y
    ),
    mx AS (SELECT x, sum(n) AS nx FROM j GROUP BY x),
    my AS (SELECT y, sum(n) AS ny FROM j GROUP BY y),
    t AS (SELECT sum(n) * 1.0 AS total FROM j),
    cells AS (
      SELECT mx.nx, my.ny, coalesce(j.n, 0) AS o
      FROM mx CROSS JOIN my
      LEFT JOIN j ON j.x = mx.x AND j.y = my.y
    )
    SELECT round(2.0 * sum(CASE WHEN o > 0
                   THEN o * ln(o / (nx * ny / t.total)) ELSE 0 END), 6)
               AS g_stat,
           CAST((SELECT count(*) - 1 FROM mx)
                * (SELECT count(*) - 1 FROM my) AS BIGINT) AS df
    FROM cells CROSS JOIN t
    GROUP BY ALL
"""


def q_region_balance_mantel_haenszel(sf_dir: str):
    """Mantel-Haenszel stratified 2×2 analysis: association between a
    positive account balance (exposure) and the BUILDING market segment
    (outcome) across REGION strata — the common odds ratio OR_MH =
    Σ(aᵢdᵢ/Nᵢ)/Σ(bᵢcᵢ/Nᵢ) and the CMH chi-square (Σaᵢ − ΣE[aᵢ])²/ΣV —
    the confounder-adjusted 2×2 that a naive pooled table gets wrong
    when strata differ (Simpson's paradox guard).  Two broadcast dim
    joins + ONE region-keyed integer contingency combiner."""
    from ..stages.agg import grouped_map, round_like_duckdb

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_acctbal", "c_mktsegment"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j = broadcast_join(cust, nat, left_key="c_nationkey",
                       right_key="n_nationkey", columns=["n_regionkey"])
    j = broadcast_join(j, reg, left_key="n_regionkey",
                       right_key="r_regionkey", columns=["r_name"])

    def prep(b: pa.Table) -> pa.Table:
        one = pa.scalar(1, pa.int64())
        e = pc.cast(pc.greater(b.column("c_acctbal"),
                               pa.scalar(0.0, pa.float64())), pa.int64())
        y = pc.cast(pc.equal(b.column("c_mktsegment"),
                             pa.scalar("BUILDING")), pa.int64())
        ne = pc.subtract(one, e)
        ny = pc.subtract(one, y)
        return pa.table({
            "r_name": b.column("r_name"),
            "a": pc.multiply(e, y),
            "b": pc.multiply(e, ny),
            "c": pc.multiply(ne, y),
            "d": pc.multiply(ne, ny),
        })

    cells = grouped_agg(j.map_batches(prep, batch_format="pyarrow"),
                        ["r_name"],
                        [("a", "a", "sum"), ("b", "b", "sum"),
                         ("c", "c", "sum"), ("d", "d", "sum")],
                        sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_strata": pa.array([], pa.int64()),
            "or_mh": pa.array([], pa.float64()),
            "cmh_chi2": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.float64)
        nt = a + b + c + d
        num = float((a * d / nt).sum())
        den = float((b * c / nt).sum())
        or_mh = num / den if den > 0.0 else None
        e_a = (a + b) * (a + c) / nt
        v_a = ((a + b) * (c + d) * (a + c) * (b + d)
               / (nt * nt * (nt - 1.0)))
        vs = float(v_a.sum())
        chi2 = ((float(a.sum()) - float(e_a.sum())) ** 2 / vs
                if vs > 0.0 else None)
        out = pa.table({
            "n_strata": pa.array([t.num_rows], pa.int64()),
            "or_mh": pa.array([or_mh], pa.float64()),
            "cmh_chi2": pa.array([chi2], pa.float64()),
        })
        for name in ("or_mh", "cmh_chi2"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(cells.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_strata", "or_mh", "cmh_chi2"]),
        batch_format="pyarrow")


QUERIES["q_region_balance_mantel_haenszel"] = q_region_balance_mantel_haenszel
ORACLE_SQL["q_region_balance_mantel_haenszel"] = """
    WITH j AS (
      SELECT r_name,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS e,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS y
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    ),
    g AS (
      SELECT r_name,
             sum(e * y) * 1.0 AS a, sum(e * (1 - y)) * 1.0 AS b,
             sum((1 - e) * y) * 1.0 AS c,
             sum((1 - e) * (1 - y)) * 1.0 AS d
      FROM j GROUP BY r_name
    ),
    s AS (
      SELECT count(*) AS k,
             sum(a * d / (a + b + c + d)) AS num,
             sum(b * c / (a + b + c + d)) AS den,
             sum(a) AS sa,
             sum((a + b) * (a + c) / (a + b + c + d)) AS se,
             sum((a + b) * (c + d) * (a + c) * (b + d)
                 / (pow(a + b + c + d, 2) * (a + b + c + d - 1.0))) AS sv
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS n_strata,
           round(num / den, 6) AS or_mh,
           round(pow(sa - se, 2) / sv, 6) AS cmh_chi2
    FROM s
"""


def q_weekend_value_mood_median(sf_dir: str):
    """Mood's median test weekday vs weekend event value: classify every
    event as above/below the exact global median (quantile_cont), then a
    2×2 chi-square with Yates continuity correction — the
    median-equality screen that is robust where the t-test's
    mean-equality is not; the coarse-but-assumption-free cousin of the
    Mann-Whitney on the same temporal split.  One exact global quantile
    + one integer-cell combiner pass."""
    from ..stages.agg import grouped_map, round_like_duckdb
    from ..stages.sort import global_exact_quantiles

    ev = _read(sf_dir, "events", ["ts", "value"])
    vals = ev.map_batches(
        lambda b: b.select(["value"]).filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")
    med = global_exact_quantiles(vals, "value", [("q", 0.5)],
                                 round_to=6)["q"]

    def cells(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        we = pc.cast(pc.greater_equal(dow, pa.scalar(6, pa.int64())),
                     pa.int64())
        hi = pc.cast(pc.greater(b.column("value"),
                                pa.scalar(med, pa.float64())), pa.int64())
        one = pa.scalar(1, pa.int64())
        return _add_g(pa.table({
            "a": pc.multiply(we, hi),
            "b": pc.multiply(we, pc.subtract(one, hi)),
            "c": pc.multiply(pc.subtract(one, we), hi),
            "d": pc.multiply(pc.subtract(one, we),
                             pc.subtract(one, hi)),
        }))

    t2 = grouped_agg(ev.map_batches(cells, batch_format="pyarrow"),
                     ["__g"],
                     [("a", "a", "sum"), ("b", "b", "sum"),
                      ("c", "c", "sum"), ("d", "d", "sum")],
                     sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "median_value": pa.array([], pa.float64()),
            "weekend_above": pa.array([], pa.int64()),
            "weekday_above": pa.array([], pa.int64()),
            "chi2_yates": pa.array([], pa.float64()),
        })
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        r = t.to_pylist()[0]
        a, b, c, d = (float(r[k]) for k in ("a", "b", "c", "d"))
        nt = a + b + c + d
        det = abs(a * d - b * c)
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = (nt * max(det - nt / 2.0, 0.0) ** 2 / denom
                if denom > 0.0 else None)
        out = pa.table({
            "median_value": pa.array([float(med)], pa.float64()),
            "weekend_above": pa.array([int(a)], pa.int64()),
            "weekday_above": pa.array([int(c)], pa.int64()),
            "chi2_yates": pa.array([chi2], pa.float64()),
        })
        return out.set_column(
            3, "chi2_yates", round_like_duckdb(out.column("chi2_yates"), 6))

    return finalize(_to_table(t2))


QUERIES["q_weekend_value_mood_median"] = q_weekend_value_mood_median
ORACLE_SQL["q_weekend_value_mood_median"] = """
    WITH m AS (
      SELECT round(quantile_cont(value, 0.5), 6) AS med FROM events
      WHERE value IS NOT NULL
    ),
    p AS (
      SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 + 1 >= 6
                  THEN 1 ELSE 0 END AS we,
             CASE WHEN value > (SELECT med FROM m) THEN 1 ELSE 0 END AS hi
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT sum(we * hi) * 1.0 AS a, sum(we * (1 - hi)) * 1.0 AS b,
             sum((1 - we) * hi) * 1.0 AS c,
             sum((1 - we) * (1 - hi)) * 1.0 AS d
      FROM p
    )
    SELECT (SELECT med FROM m) AS median_value,
           CAST(a AS BIGINT) AS weekend_above,
           CAST(c AS BIGINT) AS weekday_above,
           round((a + b + c + d)
                 * pow(greatest(abs(a * d - b * c)
                                - (a + b + c + d) / 2.0, 0.0), 2)
                 / ((a + b) * (c + d) * (a + c) * (b + d)), 6)
               AS chi2_yates
    FROM g
"""


def _lang_word_counts(sf_dir: str):
    """Per-(lang, word) token counts over whitespace tokenization — the
    shared frequency-spectrum preamble of the vocabulary-richness
    estimators (Chao1, Good-Turing, Hill numbers).  One flatten map +
    one combiner exchange; raw documents are touched once per query."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": pa.array(np.repeat(langs, lens), pa.string()),
            "word": pc.list_flatten(toks),
        })

    return grouped_agg(docs.map_batches(words, batch_format="pyarrow"),
                       ["lang", "word"], [("n", "word", "count")],
                       sum_as_float=False)


def q_vocab_chao1(sf_dir: str):
    """Chao1 richness estimator per language: how many word TYPES does
    the corpus actually have, including the ones not yet seen?  Chao1 =
    V + F₁(F₁−1)/(2(F₂+1)) (bias-corrected form, defined when no
    doubletons exist) from the frequency spectrum's singleton/doubleton
    counts — the data-collection stop rule ("is more crawling still
    buying vocabulary?") next to the Heaps'-law fit.  Exact integer
    spectrum from one word-count combiner + one per-language fold."""
    from ..stages.agg import round_like_duckdb

    c = _lang_word_counts(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        one = pa.scalar(1, pa.int64())
        return pa.table({
            "lang": b.column("lang"),
            "n": n,
            "f1": pc.cast(pc.equal(n, one), pa.int64()),
            "f2": pc.cast(pc.equal(n, pa.scalar(2, pa.int64())),
                          pa.int64()),
        })

    g = grouped_agg(c.map_batches(fold, batch_format="pyarrow"), ["lang"],
                    [("vocab", "n", "count"), ("tok", "n", "sum"),
                     ("f1", "f1", "sum"), ("f2", "f2", "sum")],
                    sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column("vocab"), pa.float64())
        f1 = pc.cast(b.column("f1"), pa.float64())
        f2 = pc.cast(b.column("f2"), pa.float64())
        chao = pc.add(v, pc.divide(
            pc.multiply(f1, pc.subtract(f1, pa.scalar(1.0, pa.float64()))),
            pc.multiply(pa.scalar(2.0, pa.float64()),
                        pc.add(f2, pa.scalar(1.0, pa.float64())))))
        return pa.table({
            "lang": b.column("lang"),
            "n_tokens": pc.cast(b.column("tok"), pa.int64()),
            "vocab_size": pc.cast(b.column("vocab"), pa.int64()),
            "f1_singletons": pc.cast(b.column("f1"), pa.int64()),
            "f2_doubletons": pc.cast(b.column("f2"), pa.int64()),
            "chao1": round_like_duckdb(chao, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_vocab_chao1"] = q_vocab_chao1
ORACLE_SQL["q_vocab_chao1"] = """
    WITH c AS (
      SELECT lang, w AS word, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    g AS (
      SELECT lang, count(*) AS vocab, sum(n) AS tok,
             sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
      FROM c GROUP BY 1
    )
    SELECT lang, CAST(tok AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab_size,
           CAST(f1 AS BIGINT) AS f1_singletons,
           CAST(f2 AS BIGINT) AS f2_doubletons,
           round(vocab + f1 * 1.0 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 6)
               AS chao1
    FROM g
"""


def q_vocab_good_turing(sf_dir: str):
    """Good-Turing frequency smoothing per language: the estimated
    probability mass of UNSEEN words p₀ = F₁/N (Turing's estimator) and
    the smoothed effective count r*(1) = 2·F₂/F₁ for singletons — what a
    language model should charge for out-of-vocabulary tokens, read
    straight off the frequency spectrum (the companion to the in-plan
    bigram-LM perplexity scorer, which uses an additive fallback).
    Exact integer spectrum; one combiner + one per-language fold."""
    from ..stages.agg import round_like_duckdb

    c = _lang_word_counts(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.int64())
        return pa.table({
            "lang": b.column("lang"),
            "n": n,
            "f1": pc.cast(pc.equal(n, pa.scalar(1, pa.int64())),
                          pa.int64()),
            "f2": pc.cast(pc.equal(n, pa.scalar(2, pa.int64())),
                          pa.int64()),
        })

    g = grouped_agg(c.map_batches(fold, batch_format="pyarrow"), ["lang"],
                    [("tok", "n", "sum"), ("f1", "f1", "sum"),
                     ("f2", "f2", "sum")], sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        tok = pc.cast(b.column("tok"), pa.float64())
        f1 = pc.cast(b.column("f1"), pa.float64())
        f2 = pc.cast(b.column("f2"), pa.float64())
        p0 = pc.divide(f1, tok)
        rstar = pc.if_else(
            pc.greater(f1, pa.scalar(0.0, pa.float64())),
            pc.divide(pc.multiply(pa.scalar(2.0, pa.float64()), f2), f1),
            pa.scalar(None, pa.float64()))
        return pa.table({
            "lang": b.column("lang"),
            "n_tokens": pc.cast(b.column("tok"), pa.int64()),
            "f1_singletons": pc.cast(b.column("f1"), pa.int64()),
            "f2_doubletons": pc.cast(b.column("f2"), pa.int64()),
            "p0_unseen": round_like_duckdb(p0, 6),
            "r_star_1": round_like_duckdb(rstar, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_vocab_good_turing"] = q_vocab_good_turing
ORACLE_SQL["q_vocab_good_turing"] = """
    WITH c AS (
      SELECT lang, w AS word, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    g AS (
      SELECT lang, sum(n) AS tok,
             sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
      FROM c GROUP BY 1
    )
    SELECT lang, CAST(tok AS BIGINT) AS n_tokens,
           CAST(f1 AS BIGINT) AS f1_singletons,
           CAST(f2 AS BIGINT) AS f2_doubletons,
           round(f1 * 1.0 / tok, 6) AS p0_unseen,
           round(CASE WHEN f1 > 0 THEN 2.0 * f2 / f1 END, 6) AS r_star_1
    FROM g
"""


def q_lang_hill_numbers(sf_dir: str):
    """Hill-number diversity profile of each language's vocabulary: the
    effective word counts ⁰D = richness V, ¹D = exp(Shannon H), ²D =
    inverse Simpson 1/Σpᵢ² — one axis (q = how much common words
    dominate) unifying the richness/entropy/concentration views — plus
    Pielou evenness J = H/ln V.  H folds as ln N − Σ n·ln n / N from the
    same exact integer spectrum; one combiner + one per-language fold."""
    from ..stages.agg import round_like_duckdb

    c = _lang_word_counts(sf_dir)

    def fold(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        return pa.table({
            "lang": b.column("lang"),
            "n": pc.cast(b.column("n"), pa.int64()),
            "nlogn": pc.multiply(n, pc.ln(n)),
            "n2": pc.multiply(n, n),
        })

    g = grouped_agg(c.map_batches(fold, batch_format="pyarrow"), ["lang"],
                    [("vocab", "n", "count"), ("tok", "n", "sum"),
                     ("snl", "nlogn", "sum"), ("s2", "n2", "sum")],
                    sum_as_float=False)

    def finalize(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column("vocab"), pa.float64())
        tok = pc.cast(b.column("tok"), pa.float64())
        snl = pc.cast(b.column("snl"), pa.float64())
        s2 = pc.cast(b.column("s2"), pa.float64())
        h = pc.subtract(pc.ln(tok), pc.divide(snl, tok))
        hill1 = pc.exp(h)
        hill2 = pc.divide(pc.multiply(tok, tok), s2)
        pielou = pc.if_else(
            pc.greater(v, pa.scalar(1.0, pa.float64())),
            pc.divide(h, pc.ln(v)), pa.scalar(None, pa.float64()))
        return pa.table({
            "lang": b.column("lang"),
            "hill_q0": pc.cast(b.column("vocab"), pa.int64()),
            "hill_q1": round_like_duckdb(hill1, 6),
            "hill_q2": round_like_duckdb(hill2, 6),
            "pielou_j": round_like_duckdb(pielou, 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_lang_hill_numbers"] = q_lang_hill_numbers
ORACLE_SQL["q_lang_hill_numbers"] = """
    WITH c AS (
      SELECT lang, w AS word, count(*) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    g AS (
      SELECT lang, count(*) AS vocab, sum(n) * 1.0 AS tok,
             sum(n * ln(n)) AS snl, sum(n * 1.0 * n) AS s2
      FROM c GROUP BY 1
    )
    SELECT lang,
           CAST(vocab AS BIGINT) AS hill_q0,
           round(exp(ln(tok) - snl / tok), 6) AS hill_q1,
           round(tok * tok / s2, 6) AS hill_q2,
           round(CASE WHEN vocab > 1
                 THEN (ln(tok) - snl / tok) / ln(vocab) END, 6) AS pielou_j
    FROM g
"""


def _supply_edges(sf_dir: str):
    """Distinct (part, supplier) edges of the bipartite supply graph
    observed in lineitem — the shared preamble of the graph-analytics
    queries (assortativity, HITS).  One combiner exchange dedups the
    multi-edges; the edge list is materialized once per query."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    edges = grouped_agg(li, ["l_partkey", "l_suppkey"],
                        [("__n", "l_partkey", "count")])
    return edges.map_batches(
        lambda b: b.select(["l_partkey", "l_suppkey"]),
        batch_format="pyarrow").materialize()


def q_supply_assortativity(sf_dir: str):
    """Degree assortativity of the bipartite supply graph: the Pearson
    correlation between deg(part) and deg(supplier) across its distinct
    edges — negative means high-degree parts attach to low-degree
    suppliers (hub-and-spoke), positive means rich-club mixing; THE
    one-number topology fingerprint next to the degree distribution.
    Two tiny degree aggregates broadcast back onto the edge stream; the
    correlation folds from one mergeable moment pass (exact integer
    degrees)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    edges = _supply_edges(sf_dir)
    pdeg = grouped_agg(edges, ["l_partkey"],
                       [("deg_p", "l_partkey", "count")],
                       sum_as_float=False)
    sdeg = grouped_agg(edges, ["l_suppkey"],
                       [("deg_s", "l_suppkey", "count")],
                       sum_as_float=False)
    j = broadcast_join(edges, pdeg, left_key="l_partkey",
                       columns=["deg_p"])
    j = broadcast_join(j, sdeg, left_key="l_suppkey", columns=["deg_s"])

    def moments(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("deg_p"), pa.float64())
        y = pc.cast(b.column("deg_s"), pa.float64())
        return _add_g(pa.table({
            "x": x, "y": y, "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y), "xy": pc.multiply(x, y),
        }))

    m = grouped_agg(j.map_batches(moments, batch_format="pyarrow"),
                    ["__g"],
                    [("n", "x", "count"), ("sx", "x", "sum"),
                     ("sy", "y", "sum"), ("sxx", "xx", "sum"),
                     ("syy", "yy", "sum"), ("sxy", "xy", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_edges": pa.array([], pa.int64()),
            "assortativity": pa.array([], pa.float64()),
        })
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        r = t.to_pylist()[0]
        n = float(r["n"])
        cov = r["sxy"] - r["sx"] * r["sy"] / n
        vx = r["sxx"] - r["sx"] * r["sx"] / n
        vy = r["syy"] - r["sy"] * r["sy"] / n
        rho = cov / np.sqrt(vx * vy) if vx > 0.0 and vy > 0.0 else None
        out = pa.table({
            "n_edges": pa.array([int(n)], pa.int64()),
            "assortativity": pa.array([rho], pa.float64()),
        })
        return out.set_column(
            1, "assortativity",
            round_like_duckdb(out.column("assortativity"), 6))

    return finalize(_to_table(m))


QUERIES["q_supply_assortativity"] = q_supply_assortativity
ORACLE_SQL["q_supply_assortativity"] = """
    WITH e AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    pd AS (SELECT l_partkey, count(*) AS deg_p FROM e GROUP BY 1),
    sd AS (SELECT l_suppkey, count(*) AS deg_s FROM e GROUP BY 1),
    j AS (
      SELECT deg_p * 1.0 AS x, deg_s * 1.0 AS y
      FROM e JOIN pd USING (l_partkey) JOIN sd USING (l_suppkey)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(corr(y, x), 6) AS assortativity
    FROM j
"""


def q_supply_hits(sf_dir: str):
    """HITS hubs-and-authorities on the bipartite supply graph, two
    exact power iterations from h₀ ≡ 1: a₁(p) = deg(p), h₁(s) =
    Σ_{p∈N(s)} a₁(p), a₂(p) = Σ_{s∈N(p)} h₁(s), h₂(s) = Σ a₂(p) — every
    score an exact INTEGER (no normalization inside the iteration), so
    the top-10 hub suppliers and their max-normalized scores are
    bitwise deterministic.  Each iteration is one broadcast of the tiny
    score table onto the edge stream + one keyed combiner — the edge
    list never self-joins; the same shape scales to any iteration
    count.  Reference iterative-centrality parity target:
    graphframes-style HITS (unrolled, fixed k=2)."""
    from ..stages.agg import global_topk, round_like_duckdb

    edges = _supply_edges(sf_dir)
    # a1(p) = deg(p)
    a1 = grouped_agg(edges, ["l_partkey"],
                     [("a1", "l_partkey", "count")], sum_as_float=False)
    # h1(s) = sum over incident parts of a1(p)
    e1 = broadcast_join(edges, a1, left_key="l_partkey", columns=["a1"])
    h1 = grouped_agg(e1, ["l_suppkey"], [("h1", "a1", "sum")],
                     sum_as_float=False)
    # a2(p) = sum over incident suppliers of h1(s)
    e2 = broadcast_join(edges, h1, left_key="l_suppkey", columns=["h1"])
    a2 = grouped_agg(e2, ["l_partkey"], [("a2", "h1", "sum")],
                     sum_as_float=False)
    # h2(s) = sum over incident parts of a2(p)
    e3 = broadcast_join(edges, a2, left_key="l_partkey", columns=["a2"])
    h2 = grouped_agg(e3, ["l_suppkey"], [("h2", "a2", "sum")],
                     sum_as_float=False)

    h2 = h2.map_batches(
        lambda b: pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "h2": pc.cast(b.column("h2"), pa.int64()),
        }), batch_format="pyarrow").materialize()
    mx = _to_table(grouped_agg(
        h2.map_batches(_add_g, batch_format="pyarrow"), ["__g"],
        [("m", "h2", "max")], sum_as_float=False))
    if mx.num_rows == 0:
        return pa.table({
            "l_suppkey": pa.array([], pa.int64()),
            "hub_score": pa.array([], pa.int64()),
            "hub_norm": pa.array([], pa.float64()),
        })
    m = float(mx.column("m")[0].as_py())
    top = global_topk(h2, ["h2", "l_suppkey"], 10,
                      descending=[True, False])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "hub_score": b.column("h2"),
            "hub_norm": round_like_duckdb(
                pc.divide(pc.cast(b.column("h2"), pa.float64()),
                          pa.scalar(m, pa.float64())), 6),
        })

    return top.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_supply_hits"] = q_supply_hits
ORACLE_SQL["q_supply_hits"] = """
    WITH e AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    a1 AS (SELECT l_partkey, count(*) AS a1 FROM e GROUP BY 1),
    h1 AS (
      SELECT l_suppkey, sum(a1) AS h1
      FROM e JOIN a1 USING (l_partkey) GROUP BY 1
    ),
    a2 AS (
      SELECT l_partkey, sum(h1) AS a2
      FROM e JOIN h1 USING (l_suppkey) GROUP BY 1
    ),
    h2 AS (
      SELECT l_suppkey, sum(a2) AS h2
      FROM e JOIN a2 USING (l_partkey) GROUP BY 1
    ),
    m AS (SELECT max(h2) * 1.0 AS m FROM h2)
    SELECT l_suppkey, CAST(h2 AS BIGINT) AS hub_score,
           round(h2 / (SELECT m FROM m), 6) AS hub_norm
    FROM h2
    ORDER BY h2 DESC, l_suppkey
    LIMIT 10
"""


def q_event_type_bartlett(sf_dir: str):
    """Bartlett's test for equal variances of event value across event
    types: T = [(N−k)·ln s²_p − Σ(nᵢ−1)·ln s²ᵢ] / C with the standard
    correction C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)) — the
    high-power-under-normality homogeneity gate next to the robust
    Levene on the same grouping (Bartlett catches smaller variance
    differences; Levene survives heavy tails).  One mergeable-moment
    combiner collapses the stream to k rows."""
    from ..stages.agg import grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value")
        return pa.table({
            "event_type": b.column("event_type"),
            "v": v, "vv": pc.multiply(v, v),
        })

    g = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                    ["event_type"],
                    [("n", "v", "count"), ("s", "v", "sum"),
                     ("ss", "vv", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "k_groups": pa.array([], pa.int64()),
            "n_total": pa.array([], pa.int64()),
            "bartlett_t": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ss = t.column("ss").to_numpy(zero_copy_only=False)
        if (n < 2).any():
            return empty
        var = (ss - s * s / n) / (n - 1.0)
        if (var <= 0.0).any():
            return empty
        k = float(len(n))
        nt = float(n.sum())
        sp2 = float(((n - 1.0) * var).sum()) / (nt - k)
        num = (nt - k) * np.log(sp2) - float(
            ((n - 1.0) * np.log(var)).sum())
        c = 1.0 + (float((1.0 / (n - 1.0)).sum()) - 1.0 / (nt - k)) \
            / (3.0 * (k - 1.0))
        stat = num / c
        out = pa.table({
            "k_groups": pa.array([int(k)], pa.int64()),
            "n_total": pa.array([int(nt)], pa.int64()),
            "bartlett_t": pa.array([stat], pa.float64()),
        })
        return out.set_column(
            2, "bartlett_t", round_like_duckdb(out.column("bartlett_t"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["k_groups", "n_total", "bartlett_t"]),
        batch_format="pyarrow")


QUERIES["q_event_type_bartlett"] = q_event_type_bartlett
ORACLE_SQL["q_event_type_bartlett"] = """
    WITH g AS (
      SELECT event_type, count(*) * 1.0 AS n, var_samp(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT count(*) * 1.0 AS k, sum(n) AS nt,
             sum((n - 1.0) * v) / (sum(n) - count(*)) AS sp2,
             sum((n - 1.0) * ln(v)) AS slnv,
             sum(1.0 / (n - 1.0)) AS sinv
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(nt AS BIGINT) AS n_total,
           round(((nt - k) * ln(sp2) - slnv)
                 / (1.0 + (sinv - 1.0 / (nt - k)) / (3.0 * (k - 1.0))), 6)
               AS bartlett_t
    FROM t
"""


def q_event_type_tukey_hsd(sf_dir: str):
    """Tukey-Kramer HSD post-hoc after the event-type ANOVA: for every
    pair of event types, the mean difference and the studentized-range
    q statistic (mᵢ−mⱼ)/√(MSW/2·(1/nᵢ+1/nⱼ)) against the pooled
    within-group variance — WHICH types differ once q_event_type_anova
    says "some do", with the familywise-honest scaling.  The stream
    collapses to k moment rows in one combiner; the k(k−1)/2 pairs
    materialize only in the tiny finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        v = b.column("value")
        return pa.table({
            "event_type": b.column("event_type"),
            "v": v, "vv": pc.multiply(v, v),
        })

    g = grouped_agg(ev.map_batches(prep, batch_format="pyarrow"),
                    ["event_type"],
                    [("n", "v", "count"), ("s", "v", "sum"),
                     ("ss", "vv", "sum")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "mean_diff": pa.array([], pa.float64()),
            "q_stat": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("event_type", "ascending")])
        names = t.column("event_type").to_pylist()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ss = t.column("ss").to_numpy(zero_copy_only=False)
        if (n < 2).any():
            return empty
        m = s / n
        sse = float((ss - s * s / n).sum())
        nt = float(n.sum())
        k = float(len(n))
        msw = sse / (nt - k)
        if msw <= 0.0:
            return empty
        rows_a, rows_b, diffs, qs = [], [], [], []
        for i in range(len(names)):
            for j2 in range(i + 1, len(names)):
                d = m[i] - m[j2]
                se = np.sqrt(msw / 2.0 * (1.0 / n[i] + 1.0 / n[j2]))
                rows_a.append(names[i])
                rows_b.append(names[j2])
                diffs.append(d)
                qs.append(d / se if se > 0.0 else None)
        out = pa.table({
            "type_a": pa.array(rows_a, pa.string()),
            "type_b": pa.array(rows_b, pa.string()),
            "mean_diff": pa.array(diffs, pa.float64()),
            "q_stat": pa.array(qs, pa.float64()),
        })
        for name in ("mean_diff", "q_stat"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["type_a", "type_b", "mean_diff", "q_stat"]),
        batch_format="pyarrow")


QUERIES["q_event_type_tukey_hsd"] = q_event_type_tukey_hsd
ORACLE_SQL["q_event_type_tukey_hsd"] = """
    WITH g AS (
      SELECT event_type, count(*) * 1.0 AS n, avg(value) AS m,
             var_samp(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT sum((n - 1.0) * v) / (sum(n) - count(*)) AS msw FROM g
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m)
                 / sqrt((SELECT msw FROM w) / 2.0
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
    FROM g a JOIN g b ON a.event_type < b.event_type
"""


def q_dow_value_dunn(sf_dir: str):
    """Dunn's post-hoc test after the day-of-week Kruskal-Wallis: for
    every dow pair, z = (R̄ᵢ−R̄ⱼ)/√[(N(N+1)/12 − T/(12(N−1)))·(1/nᵢ+1/nⱼ)]
    with the tie term T = Σ(t³−t) — WHICH days differ once
    q_dow_value_kruskal says "some do".  Rides the identical
    distinct-value rank machinery (combiner → range sort → prefix sums;
    raw rows never ranked); the 21 pairs materialize only in the tiny
    finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb
    from ..stages.joins import hash_join
    from ..stages.sort import global_prefix_sums, range_sort

    ev = _read(sf_dir, "events", ["ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        d3 = pc.add(day, pa.scalar(3, pa.int64()))
        dow = pc.add(pc.subtract(
            d3, pc.multiply(pc.divide(d3, pa.scalar(7, pa.int64())),
                            pa.scalar(7, pa.int64()))),
            pa.scalar(1, pa.int64()))
        return pa.table({"dow": dow, "value": b.column("value")})

    base = ev.map_batches(proj, batch_format="pyarrow")
    g = grouped_agg(base, ["dow", "value"],
                    [("n", "value", "count")]).materialize()
    v = grouped_agg(g, ["value"], [("t", "n", "sum")])
    s = range_sort(v, "value")
    s = global_prefix_sums(s, "t", out_name="__below", exclusive=True)

    def frank_of(b: pa.Table) -> pa.Table:
        below = b.column("__below").to_numpy(zero_copy_only=False)
        t = b.column("t").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "value": b.column("value"),
            "frank": pa.array(below + (t + 1.0) / 2.0, pa.float64()),
            "tie3": pa.array(t ** 3 - t, pa.float64()),
        })

    franks = s.map_batches(frank_of, batch_format="pyarrow").materialize()
    j = hash_join(g, franks, left_key="value", right_key="value",
                  how="inner")

    def weighted(b: pa.Table) -> pa.Table:
        return pa.table({
            "dow": b.column("dow"),
            "nf": pc.multiply(pc.cast(b.column("n"), pa.float64()),
                              b.column("frank")),
            "n": b.column("n"),
        })

    per_dow = grouped_agg(j.map_batches(weighted, batch_format="pyarrow"),
                          ["dow"], [("r", "nf", "sum"), ("n", "n", "sum")])
    tie_tot = float(franks.sum("tie3"))

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "dow_a": pa.array([], pa.int64()),
            "dow_b": pa.array([], pa.int64()),
            "mean_rank_diff": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("dow", "ascending")])
        dows = t.column("dow").to_pylist()
        r = t.column("r").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        nt = float(n.sum())
        base_var = nt * (nt + 1.0) / 12.0 \
            - tie_tot / (12.0 * (nt - 1.0))
        mr = r / n
        da, db, dd, zz = [], [], [], []
        for i in range(len(dows)):
            for j2 in range(i + 1, len(dows)):
                d = mr[i] - mr[j2]
                se = np.sqrt(base_var * (1.0 / n[i] + 1.0 / n[j2]))
                da.append(int(dows[i]))
                db.append(int(dows[j2]))
                dd.append(d)
                zz.append(d / se if se > 0.0 else None)
        out = pa.table({
            "dow_a": pa.array(da, pa.int64()),
            "dow_b": pa.array(db, pa.int64()),
            "mean_rank_diff": pa.array(dd, pa.float64()),
            "z": pa.array(zz, pa.float64()),
        })
        for name in ("mean_rank_diff", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(per_dow.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["dow_a", "dow_b", "mean_rank_diff", "z"]),
        batch_format="pyarrow")


QUERIES["q_dow_value_dunn"] = q_dow_value_dunn
ORACLE_SQL["q_dow_value_dunn"] = """
    WITH s AS (
      SELECT (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS dow, value
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT dow,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS frank
      FROM s
    ),
    g AS (
      SELECT dow, sum(frank) / count(*) AS mr, count(*) * 1.0 AS n
      FROM r GROUP BY 1
    ),
    tie AS (
      SELECT coalesce(sum(CAST(t AS DOUBLE) * t * t - t), 0.0) AS tt
      FROM (SELECT value, count(*) AS t FROM s GROUP BY 1)
    ),
    nn AS (SELECT sum(n) AS nt FROM g),
    bv AS (
      SELECT nt * (nt + 1.0) / 12.0 - tt / (12.0 * (nt - 1.0)) AS base_var
      FROM nn, tie
    )
    SELECT CAST(a.dow AS BIGINT) AS dow_a, CAST(b.dow AS BIGINT) AS dow_b,
           round(a.mr - b.mr, 6) AS mean_rank_diff,
           round((a.mr - b.mr)
                 / sqrt((SELECT base_var FROM bv)
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS z
    FROM g a JOIN g b ON a.dow < b.dow
"""


def q_weekend_value_cliffs_delta(sf_dir: str):
    """Cliff's delta effect size weekend vs weekday event value:
    δ = (#{we>wd} − #{we<wd})/(n₁·n₂), the ordinal dominance probability
    difference — the scale-free effect size that accompanies the
    Mann-Whitney p-value (how OFTEN a weekend value beats a weekday one,
    regardless of by how much).  Both pair counts are EXACT integers
    read off the shared EDF grid (Σ n_we(v)·{counts strictly below/above
    v}) — no pairs ever materialize."""
    from ..stages.agg import round_like_duckdb

    s, n1, n2 = _weekend_value_edf_grid(sf_dir)
    empty = pa.table({
        "n_weekday": pa.array([], pa.int64()),
        "n_weekend": pa.array([], pa.int64()),
        "cliffs_delta": pa.array([], pa.float64()),
    })
    if n1 == 0 or n2 == 0:
        return empty

    def contrib(b: pa.Table) -> pa.Table:
        nwe = pc.cast(b.column("n_we"), pa.int64())
        cwd = pc.cast(b.column("c_wd"), pa.int64())
        nwd = pc.cast(b.column("n_wd"), pa.int64())
        below = pc.subtract(cwd, nwd)  # weekday strictly below v
        above = pc.subtract(pa.scalar(n1, pa.int64()), cwd)
        return _add_g(pa.table({
            "gt": pc.multiply(nwe, below),
            "lt": pc.multiply(nwe, above),
        }))

    t = _to_table(grouped_agg(
        s.map_batches(contrib, batch_format="pyarrow"), ["__g"],
        [("gt", "gt", "sum"), ("lt", "lt", "sum")], sum_as_float=False))
    if t.num_rows == 0:
        return empty
    gt = float(t.column("gt")[0].as_py())
    lt = float(t.column("lt")[0].as_py())
    delta = (gt - lt) / (float(n1) * float(n2))
    out = pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "cliffs_delta": pa.array([delta], pa.float64()),
    })
    return out.set_column(
        2, "cliffs_delta", round_like_duckdb(out.column("cliffs_delta"), 6))


QUERIES["q_weekend_value_cliffs_delta"] = q_weekend_value_cliffs_delta
ORACLE_SQL["q_weekend_value_cliffs_delta"] = _EDF_GRID_SQL + """
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_weekday,
           CAST((SELECT n2 FROM t) AS BIGINT) AS n_weekend,
           round((sum(n_we * (c_wd - n_wd))
                  - sum(n_we * (CAST((SELECT n1 FROM t) AS BIGINT) - c_wd)))
                 / ((SELECT n1 FROM t) * (SELECT n2 FROM t)), 6)
               AS cliffs_delta
    FROM c
"""


def q_daily_revenue_kpss(sf_dir: str):
    """KPSS level-stationarity test on daily revenue: η = Σₜ Sₜ² /
    (n²·σ̂²_l) with Sₜ the running sum of the demeaned day-ordered series
    and σ̂²_l the Bartlett-kernel long-run variance at the standard lag
    l = ⌊4(n/100)^¼⌋ — the null-reversed companion to Dickey-Fuller
    (KPSS's null IS stationarity), so the pair classifies a series into
    stationary / unit-root / inconclusive.  One combiner exchange to the
    calendar-bounded daily table; the kernel sum is a vectorized
    O(n·l) pass in the single-group finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_days": pa.array([], pa.int64()),
            "lag_l": pa.array([], pa.int64()),
            "kpss_eta": pa.array([], pa.float64()),
        })
        if t.num_rows < 5:
            return empty
        t = t.sort_by([("day", "ascending")])
        y = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64) / 100.0
        n = len(y)
        e = y - y.sum() / n
        s_cum = np.cumsum(e)
        lag = int(np.floor(4.0 * (n / 100.0) ** 0.25))
        lrv = float((e * e).sum()) / n
        for j in range(1, lag + 1):
            w = 1.0 - j / (lag + 1.0)
            lrv += 2.0 * w * float((e[j:] * e[:-j]).sum()) / n
        if lrv <= 0.0:
            return empty
        eta = float((s_cum * s_cum).sum()) / (n * n * lrv)
        out = pa.table({
            "n_days": pa.array([n], pa.int64()),
            "lag_l": pa.array([lag], pa.int64()),
            "kpss_eta": pa.array([eta], pa.float64()),
        })
        return out.set_column(
            2, "kpss_eta", round_like_duckdb(out.column("kpss_eta"), 6))

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_days", "lag_l", "kpss_eta"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_kpss"] = q_daily_revenue_kpss
ORACLE_SQL["q_daily_revenue_kpss"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y
      FROM orders GROUP BY o_orderdate
    ),
    nn AS (
      SELECT count(*) * 1.0 AS n,
             CAST(floor(4.0 * pow(count(*) / 100.0, 0.25)) AS BIGINT) AS l
      FROM d
    ),
    e AS (
      SELECT row_number() OVER (ORDER BY day) AS rn,
             y - (SELECT avg(y) FROM d) AS e
      FROM d
    ),
    s AS (
      SELECT sum(e) OVER (ORDER BY rn) AS s_cum FROM e
    ),
    g0 AS (SELECT sum(e * e) / (SELECT n FROM nn) AS g FROM e),
    gj AS (
      SELECT coalesce(sum(2.0 * (1.0 - (a.rn - b.rn) / ((SELECT l FROM nn)
                                                        + 1.0))
                          * a.e * b.e), 0.0) / (SELECT n FROM nn) AS g
      FROM e a JOIN e b
        ON a.rn - b.rn BETWEEN 1 AND (SELECT l FROM nn)
    )
    SELECT CAST(n AS BIGINT) AS n_days, l AS lag_l,
           round((SELECT sum(s_cum * s_cum) FROM s)
                 / (n * n * ((SELECT g FROM g0) + (SELECT g FROM gj))), 6)
               AS kpss_eta
    FROM nn
"""


def q_daily_revenue_variance_ratio(sf_dir: str):
    """Lo-MacKinlay variance-ratio test (q = 5) on cumulative daily
    revenue: VR(q) = σ̂²_q/σ̂²₁ where σ̂²₁ is the variance of 1-day
    increments and σ̂²_q the overlap-estimated variance of q-day
    increments scaled by q, with the unbiased m = q(n−q+1)(1−q/n)
    normalizer — VR≈1 for a random walk, <1 mean-reverting, >1
    trending; plus the homoskedastic z = (VR−1)/√(2(2q−1)(q−1)/(3qn)).
    Increments use row-order day steps over the calendar-bounded daily
    table (one combiner; vectorized finalize)."""
    from ..stages.agg import grouped_map, round_like_duckdb

    daily = _daily_order_revenue_cents(sf_dir)
    q = 5

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_steps": pa.array([], pa.int64()),
            "vr_q": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
        })
        if t.num_rows < q + 2:
            return empty
        t = t.sort_by([("day", "ascending")])
        lvl = np.cumsum(
            t.column("c").to_numpy(zero_copy_only=False).astype(
                np.float64) / 100.0)
        d = np.diff(lvl)
        n = len(d)
        mu = (lvl[-1] - lvl[0]) / n
        s1 = float(((d - mu) ** 2).sum()) / (n - 1.0)
        qsum = lvl[q:] - lvl[:-q]
        m = q * (n - q + 1.0) * (1.0 - q / n)
        sq = float(((qsum - q * mu) ** 2).sum()) / m
        if s1 <= 0.0:
            return empty
        vr = sq / s1
        se = np.sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * n))
        z = (vr - 1.0) / se
        out = pa.table({
            "n_steps": pa.array([n], pa.int64()),
            "vr_q": pa.array([vr], pa.float64()),
            "z": pa.array([z], pa.float64()),
        })
        for name in ("vr_q", "z"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_steps", "vr_q", "z"]),
        batch_format="pyarrow")


QUERIES["q_daily_revenue_variance_ratio"] = q_daily_revenue_variance_ratio
ORACLE_SQL["q_daily_revenue_variance_ratio"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y
      FROM orders GROUP BY o_orderdate
    ),
    lv AS (
      SELECT row_number() OVER (ORDER BY day) AS rn,
             sum(y) OVER (ORDER BY day) AS lvl
      FROM d
    ),
    nn AS (SELECT count(*) - 1.0 AS n FROM lv),
    mu AS (
      SELECT ((SELECT lvl FROM lv ORDER BY rn DESC LIMIT 1)
              - (SELECT lvl FROM lv ORDER BY rn LIMIT 1))
             / (SELECT n FROM nn) AS mu
    ),
    d1 AS (
      SELECT lvl - lag(lvl) OVER (ORDER BY rn) AS d FROM lv
    ),
    s1 AS (
      SELECT sum(pow(d - (SELECT mu FROM mu), 2))
             / ((SELECT n FROM nn) - 1.0) AS s1
      FROM d1 WHERE d IS NOT NULL
    ),
    dq AS (
      SELECT lvl - lag(lvl, 5) OVER (ORDER BY rn) AS dq FROM lv
    ),
    sq AS (
      SELECT sum(pow(dq - 5.0 * (SELECT mu FROM mu), 2))
             / (5.0 * ((SELECT n FROM nn) - 5.0 + 1.0)
                * (1.0 - 5.0 / (SELECT n FROM nn))) AS sq
      FROM dq WHERE dq IS NOT NULL
    )
    SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_steps,
           round(sq / s1, 6) AS vr_q,
           round((sq / s1 - 1.0)
                 / sqrt(2.0 * 9.0 * 4.0 / (15.0 * (SELECT n FROM nn))), 6)
               AS z
    FROM s1, sq
"""


def q_daily_granger_orders_revenue(sf_dir: str):
    """Granger-causality screen: does yesterday's ORDER COUNT predict
    today's revenue beyond yesterday's revenue itself?  Restricted model
    yₜ ~ yₜ₋₁ vs unrestricted yₜ ~ yₜ₋₁ + xₜ₋₁ (closed-form 2×2 normal
    equations, the same Cramer tree as the two-predictor OLS), F =
    (RSS_r − RSS_u)/(RSS_u/(n−3)) — the lead-lag dependency test behind
    "is volume a leading indicator".  Row-order day steps; one combiner
    collapses orders to the daily (revenue, count) table."""
    from ..stages.agg import grouped_map, round_like_duckdb

    ords = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(
            b.column("o_totalprice"), pa.scalar(100.0, pa.float64()))),
            pa.int64())
        return pa.table({"day": day, "c": cents})

    daily = grouped_agg(ords.map_batches(prep, batch_format="pyarrow"),
                        ["day"], [("c", "c", "sum"),
                                  ("cnt", "c", "count")],
                        sum_as_float=False)

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "n_obs": pa.array([], pa.int64()),
            "f_stat": pa.array([], pa.float64()),
            "b_lag_orders": pa.array([], pa.float64()),
        })
        if t.num_rows < 6:
            return empty
        t = t.sort_by([("day", "ascending")])
        rev = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64) / 100.0
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = rev[1:]
        x = rev[:-1]       # lagged revenue
        z = cnt[:-1]       # lagged order count
        n = float(len(y))
        cxx = float((x * x).sum()) - x.sum() ** 2 / n
        czz = float((z * z).sum()) - z.sum() ** 2 / n
        cyy = float((y * y).sum()) - y.sum() ** 2 / n
        cxz = float((x * z).sum()) - x.sum() * z.sum() / n
        cxy = float((x * y).sum()) - x.sum() * y.sum() / n
        czy = float((z * y).sum()) - z.sum() * y.sum() / n
        det = cxx * czz - cxz * cxz
        if det <= 0.0 or cxx <= 0.0:
            return empty
        b1 = (czz * cxy - cxz * czy) / det
        b2 = (cxx * czy - cxz * cxy) / det
        rss_u = cyy - b1 * cxy - b2 * czy
        rss_r = cyy - cxy * cxy / cxx
        f = ((rss_r - rss_u) / (rss_u / (n - 3.0))
             if rss_u > 0.0 else None)
        out = pa.table({
            "n_obs": pa.array([int(n)], pa.int64()),
            "f_stat": pa.array([f], pa.float64()),
            "b_lag_orders": pa.array([b2], pa.float64()),
        })
        for name in ("f_stat", "b_lag_orders"):
            idx = out.column_names.index(name)
            out = out.set_column(
                idx, name, round_like_duckdb(out.column(name), 6))
        return out

    out = grouped_map(daily.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["n_obs", "f_stat", "b_lag_orders"]),
        batch_format="pyarrow")


QUERIES["q_daily_granger_orders_revenue"] = q_daily_granger_orders_revenue
ORACLE_SQL["q_daily_granger_orders_revenue"] = """
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS y,
             count(*) * 1.0 AS cnt
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT y, lag(y) OVER (ORDER BY day) AS x,
             lag(cnt) OVER (ORDER BY day) AS z
      FROM d
    ),
    p AS (SELECT y, x, z FROM l WHERE x IS NOT NULL),
    g AS (
      SELECT count(*) * 1.0 AS n,
             sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
             sum(x * x) AS sxx, sum(z * z) AS szz, sum(y * y) AS syy,
             sum(x * z) AS sxz, sum(x * y) AS sxy, sum(z * y) AS szy
      FROM p
    ),
    c AS (
      SELECT n,
             sxx - sx * sx / n AS cxx, szz - sz * sz / n AS czz,
             syy - sy * sy / n AS cyy, sxz - sx * sz / n AS cxz,
             sxy - sx * sy / n AS cxy, szy - sz * sy / n AS czy
      FROM g
    ),
    b AS (
      SELECT n, cyy, cxy, czy, cxx,
             (czz * cxy - cxz * czy) / (cxx * czz - cxz * cxz) AS b1,
             (cxx * czy - cxz * cxy) / (cxx * czz - cxz * cxz) AS b2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(((cyy - cxy * cxy / cxx) - (cyy - b1 * cxy - b2 * czy))
                 / ((cyy - b1 * cxy - b2 * czy) / (n - 3.0)), 6) AS f_stat,
           round(b2, 6) AS b_lag_orders
    FROM b
"""


def q_embedding_isotropy(sf_dir: str):
    """Isotropy screen of the embedding space: the EXACT mean pairwise
    cosine over all n(n−1) ordered pairs via the sum-vector identity
    mean = (‖Σuᵢ‖² − n)/(n(n−1)) on the L2-normalized vectors — ≈0 for
    an isotropic cloud, →1 when the space collapses into a narrow cone
    (the classic anisotropy failure of contextual embeddings).  NO pairs
    ever materialize: one map computes per-batch partial Σu per
    dimension, one 64-row combiner merges them — O(n·d) total."""
    from ..stages.agg import round_like_duckdb

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        m = np.asarray(arr.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(len(arr), -1)
        u = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        s = u.sum(axis=0)
        d = len(s)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "s": pa.array(s, pa.float64()),
        })

    g = _to_table(grouped_agg(
        emb.map_batches(partial, batch_format="pyarrow"), ["dim"],
        [("s", "s", "sum")]))
    empty = pa.table({
        "n_vectors": pa.array([], pa.int64()),
        "mean_pairwise_cos": pa.array([], pa.float64()),
    })
    if g.num_rows == 0:
        return empty
    n = int(_to_table(grouped_agg(
        emb.map_batches(
            lambda b: _add_g(pa.table(
                {"one": pa.array(np.ones(b.num_rows, np.int64))})),
            batch_format="pyarrow"),
        ["__g"], [("n", "one", "sum")],
        sum_as_float=False)).column("n")[0].as_py())
    if n < 2:
        return empty
    s = g.column("s").to_numpy(zero_copy_only=False)
    mean_cos = (float((s * s).sum()) - n) / (n * (n - 1.0))
    out = pa.table({
        "n_vectors": pa.array([n], pa.int64()),
        "mean_pairwise_cos": pa.array([mean_cos], pa.float64()),
    })
    return out.set_column(
        1, "mean_pairwise_cos",
        round_like_duckdb(out.column("mean_pairwise_cos"), 6))


QUERIES["q_embedding_isotropy"] = q_embedding_isotropy
ORACLE_SQL["q_embedding_isotropy"] = """
    WITH u AS (
      SELECT vec_id, gs.i AS dim,
             CAST(embedding[gs.i + 1] AS DOUBLE)
               / sqrt(list_sum(list_transform(
                   embedding, x -> CAST(x AS DOUBLE) * x))) AS u
      FROM embeddings CROSS JOIN range(64) AS gs(i)
      WHERE gs.i < len(embedding)
    ),
    s AS (SELECT dim, sum(u) AS s FROM u GROUP BY dim),
    nn AS (SELECT count(*) * 1.0 AS n FROM embeddings)
    SELECT CAST(n AS BIGINT) AS n_vectors,
           round((sum(s * s) - n) / (n * (n - 1.0)), 6)
               AS mean_pairwise_cos
    FROM s, nn
    GROUP BY n
"""


def q_embedding_norm_profile(sf_dir: str):
    """Per-label L2-norm profile of the embeddings: mean, sample std,
    min and max vector norm per class — the norm-collapse /
    norm-explosion QA check (a class whose norms crater is about to be
    unretrievable under dot-product search even if directions are fine).
    Pure map to the norm scalar + one mergeable-moment combiner."""
    from ..stages.agg import round_like_duckdb

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])

    def norms(b: pa.Table) -> pa.Table:
        arr = b.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        m = np.asarray(arr.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(len(arr), -1)
        nrm = np.sqrt((m * m).sum(axis=1))
        return pa.table({
            "label": pc.cast(b.column("label"), pa.int64()),
            "nrm": pa.array(nrm, pa.float64()),
            "nrm2": pa.array(nrm * nrm, pa.float64()),
        })

    g = grouped_agg(emb.map_batches(norms, batch_format="pyarrow"),
                    ["label"],
                    [("n", "nrm", "count"), ("s", "nrm", "sum"),
                     ("ss", "nrm2", "sum"), ("mn", "nrm", "min"),
                     ("mx", "nrm", "max")])

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("n"), pa.float64())
        s = b.column("s")
        ss = b.column("ss")
        mean = pc.divide(s, n)
        var = pc.divide(
            pc.subtract(ss, pc.divide(pc.multiply(s, s), n)),
            pc.subtract(n, pa.scalar(1.0, pa.float64())))
        sd = pc.sqrt(pc.max_element_wise(
            var, pa.scalar(0.0, pa.float64())))
        return pa.table({
            "label": b.column("label"),
            "n_vectors": pc.cast(b.column("n"), pa.int64()),
            "mean_norm": round_like_duckdb(mean, 6),
            "std_norm": round_like_duckdb(sd, 6),
            "min_norm": round_like_duckdb(b.column("mn"), 6),
            "max_norm": round_like_duckdb(b.column("mx"), 6),
        })

    return g.map_batches(finalize, batch_format="pyarrow")


QUERIES["q_embedding_norm_profile"] = q_embedding_norm_profile
ORACLE_SQL["q_embedding_norm_profile"] = """
    WITH n AS (
      SELECT CAST(label AS BIGINT) AS label,
             sqrt(list_sum(list_transform(
                 embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(nrm), 6) AS mean_norm,
           round(sqrt(greatest(
               (sum(nrm * nrm) - sum(nrm) * sum(nrm) / count(*))
               / (count(*) - 1.0), 0.0)), 6) AS std_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n GROUP BY label
"""


def q_embedding_centroid_cos(sf_dir: str):
    """Label-centroid confusability map: cosine similarity between every
    pair of class centroids — which classes the embedding space has
    nearly merged (the geometry behind the 1-NN confusion counts).  One
    per-(label, dim) combiner collapses the vectors to k·d centroid
    sums; the k(k−1)/2 cosines materialize only in the tiny finalize."""
    from ..stages.agg import grouped_map, round_like_duckdb

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        m = np.asarray(arr.values.to_numpy(zero_copy_only=False),
                       np.float64).reshape(len(arr), -1)
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(lab, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(lab))),
            "x": pa.array(m.ravel(), pa.float64()),
        })

    g = grouped_agg(emb.map_batches(partial, batch_format="pyarrow"),
                    ["label", "dim"],
                    [("s", "x", "sum"), ("n", "x", "count")])

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "label_a": pa.array([], pa.int64()),
            "label_b": pa.array([], pa.int64()),
            "centroid_cos": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        df["c"] = df["s"] / df["n"]
        piv = df.pivot_table(index="label", columns="dim", values="c")
        labs = [int(x) for x in piv.index]
        m = piv.to_numpy(dtype=np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        la, lb, cs = [], [], []
        for i in range(len(labs)):
            for j2 in range(i + 1, len(labs)):
                la.append(labs[i])
                lb.append(labs[j2])
                cs.append(float((m[i] * m[j2]).sum())
                          / (nrm[i] * nrm[j2]))
        out = pa.table({
            "label_a": pa.array(la, pa.int64()),
            "label_b": pa.array(lb, pa.int64()),
            "centroid_cos": pa.array(cs, pa.float64()),
        })
        return out.set_column(
            2, "centroid_cos",
            round_like_duckdb(out.column("centroid_cos"), 6))

    out = grouped_map(g.map_batches(_add_g, batch_format="pyarrow"),
                      "__g", finalize, per_group=False)
    return out.map_batches(
        lambda b: b.select(["label_a", "label_b", "centroid_cos"]),
        batch_format="pyarrow")


QUERIES["q_embedding_centroid_cos"] = q_embedding_centroid_cos
ORACLE_SQL["q_embedding_centroid_cos"] = """
    WITH c AS (
      SELECT CAST(label AS BIGINT) AS label, gs.i AS dim,
             avg(CAST(embedding[gs.i + 1] AS DOUBLE)) AS c
      FROM embeddings CROSS JOIN range(64) AS gs(i)
      WHERE gs.i < len(embedding)
      GROUP BY label, gs.i
    ),
    nrm AS (
      SELECT label, sqrt(sum(c * c)) AS nrm FROM c GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sum(a.c * b.c)
                 / ((SELECT nrm FROM nrm WHERE label = a.label)
                    * (SELECT nrm FROM nrm WHERE label = b.label)), 6)
               AS centroid_cos
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
"""
