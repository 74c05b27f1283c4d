"""Iterative graph operators over edge-list Datasets.

The KG pipeline materializes edges (imports, call edges, entity mentions —
SURVEY.md §2.2 target extractor); ranking/clustering those graphs is the
natural next consumer.  Everything here works on a plain ``(src, dst)``
edge Dataset and keeps the at-scale shape: node and edge tables are never
driver-materialized, each iteration is a bounded number of hash exchanges
(`hash_join` + `grouped_agg`), and state between iterations is just another
Dataset — Ray Data's lineage handles retries.

PageRank variant: the *simplified* model — dangling-node mass is NOT
redistributed, ``rank = (1-d)/N + d · Σ_in rank/outdeg`` — chosen because
it is exactly expressible in unrolled SQL, giving the DuckDB oracle
bit-comparable semantics (summation-order ulps stay ~1e-17, far below the
output rounding).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def distinct_nodes(edges, src: str = "src", dst: str = "dst",
                   out: str = "node", *, num_partitions: int = 16):
    """Distinct union of both endpoint columns (one full-row exchange over
    the already-deduped per-batch node sets)."""
    from .setops import set_op

    def col_of(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({out: b.column(name)})

        return f

    import ray  # noqa: F401  (edges is a Ray Dataset)

    left = edges.map_batches(col_of(src), batch_format="pyarrow")
    right = edges.map_batches(col_of(dst), batch_format="pyarrow")
    return set_op(left, right, "union", num_partitions=num_partitions)


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             num_partitions: int = 16, round_to: int | None = 8):
    """Distributed PageRank over an edge Dataset (simplified dangling model).

    TWO keyed exchanges per iteration, both fused:
    1. ``ranks ⋈ edges`` on ``src`` (pair co-partition); the join reduce
       also folds each partition's contributions (``rank/outdeg``) into
       per-``dst`` PARTIAL sums (``hash_join(post=)``), so the exchange
       output is ≤ |dst ∩ partition| rows, not |edges|.
    2. Those partials co-partition with the (pre-bucketed, reused) node
       table by ``dst``/``node``; the reduce finishes the sum, left-outer
       joins the nodes, and applies ``(1−d)/N + d·contrib`` in place —
       no separate aggregate-then-join round trip.
    No driver materialization, no full-table broadcast: iteration cost is
    O(|edges|/cluster) regardless of graph size.  Duplicate edges
    contribute once each (dedup upstream if your semantics require).

    Returns a Dataset ``(node, rank)``; ranks rounded to ``round_to``.
    """
    from ..state.exchange import hash_exchange_pair
    from .agg import bucket_codes, grouped_agg, round_like_duckdb
    from .joins import hash_join

    nodes = distinct_nodes(edges, src, dst, "node",
                           num_partitions=num_partitions)
    nodes = nodes.materialize()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    outdeg = grouped_agg(edges, [src], [("outdeg", src, "count")],
                         num_partitions=num_partitions, sum_as_float=False)
    # (src, dst, outdeg) — joined once, reused every iteration
    edges_deg = hash_join(
        edges, outdeg, left_key=src, num_partitions=num_partitions
    ).materialize()

    # node table bucketed by the SAME hash the contribution partials use —
    # computed once, co-partitioned against every iteration's exchange
    def bucket_nodes(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__bucket", pa.array(bucket_codes(b, ["node"], num_partitions))
        )

    nodes_b = nodes.map_batches(
        bucket_nodes, batch_format="pyarrow", batch_size=None
    ).materialize()

    init = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank", pa.array([init] * b.num_rows, pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    def post_contrib(t: pa.Table) -> pa.Table:
        # runs inside the src-keyed join reduce: partial per-dst sums
        c = pc.divide(t.column("rank"), pc.cast(t.column("outdeg"), pa.float64()))
        part = (
            pa.table({dst: t.column(dst), "c": c})
            .group_by(dst)
            .aggregate([("c", "sum")])
            .rename_columns([dst, "c"])
        )
        return part.append_column(
            "__bucket", pa.array(bucket_codes(part, [dst], num_partitions))
        )

    def reduce_update(cp: pa.Table, np_: pa.Table) -> pa.Table:
        if "__bucket" in np_.column_names:
            np_ = np_.drop_columns(["__bucket"])
        if dst in cp.column_names:
            if "__bucket" in cp.column_names:
                cp = cp.drop_columns(["__bucket"])
            summed = cp.group_by(dst).aggregate([("c", "sum")])
            joined = np_.join(
                summed, keys=["node"], right_keys=[dst], join_type="left outer"
            )
            contrib = pc.coalesce(
                joined.column("c_sum"), pa.scalar(0.0, pa.float64())
            )
            node_col = joined.column("node")
        else:  # all-empty contribution partition (schema-less block)
            contrib = pa.array([0.0] * np_.num_rows, pa.float64())
            node_col = np_.column("node")
        rank = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), contrib))
        return pa.table({"node": node_col, "rank": rank})

    for _ in range(iters):
        contrib_parts = hash_join(
            edges_deg, ranks, left_key=src, right_key="node",
            num_partitions=num_partitions, post=post_contrib,
        )
        ranks = hash_exchange_pair(
            contrib_parts,
            nodes_b,
            left_bucket_col="__bucket",
            right_bucket_col="__bucket",
            n_partitions=num_partitions,
            reduce_fn=reduce_update,
        ).materialize()

    if round_to is not None:
        ranks = ranks.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "rank": round_like_duckdb(b.column("rank"), round_to),
                }
            ),
            batch_format="pyarrow",
        )
    return ranks


def pagerank_sql(edges_sql: str, *, src: str = "src", dst: str = "dst",
                 damping: float = 0.85, iters: int = 10,
                 round_to: int = 8) -> str:
    """The DuckDB oracle: the identical simplified PageRank as ``iters``
    UNROLLED chained CTEs (recursive CTEs disallow the needed aggregate).
    ``edges_sql`` is a SELECT producing (src, dst)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        f"nodes AS (SELECT {src} AS node FROM edges "
        f"UNION SELECT {dst} AS node FROM edges)",
        "n AS (SELECT count(*) AS cnt FROM nodes)",
        f"outdeg AS (SELECT {src} AS node, count(*) AS odeg "
        f"FROM edges GROUP BY 1)",
        "pr0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"pr{i} AS (SELECT nodes.node, "
            f"(1 - {damping}) / (SELECT cnt FROM n) + {damping} * "
            f"COALESCE(s.c, 0) AS rank FROM nodes LEFT JOIN ("
            f"SELECT e.{dst} AS node, sum(p.rank / outdeg.odeg) AS c "
            f"FROM edges e "
            f"JOIN pr{i - 1} p ON p.node = e.{src} "
            f"JOIN outdeg ON outdeg.node = e.{src} "
            f"GROUP BY e.{dst}) s ON s.node = nodes.node)"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node, round(rank, {round_to}) AS rank FROM pr{iters}"
    )
