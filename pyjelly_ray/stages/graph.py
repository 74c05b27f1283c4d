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
                   out: str = "node", *, num_partitions: int | None = None):
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
             weight: str | None = None, personalization=None,
             damping: float = 0.85, iters: int = 10,
             num_partitions: int | None = None, round_to: int | None = 8):
    """Distributed PageRank over an edge Dataset (simplified dangling model).

    ``weight``: optional edge-weight column — contributions become
    ``rank · w / Σw(out)`` (weighted out-degree).  ``personalization``: an
    iterable of seed node ids — the restart mass ``(1−d)`` concentrates on
    the seeds (1/|seeds| each) instead of spreading uniformly, and ranks
    initialize from the same vector (personalized PageRank; nodes outside
    the seed set get rank only through links).

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
    import ray

    from ..state.exchange import default_partitions, hash_exchange_pair
    from .agg import bucket_codes, grouped_agg, round_like_duckdb
    from .joins import hash_join

    num_partitions = num_partitions or default_partitions()
    schema = edges.schema()
    schema = getattr(schema, "base_schema", schema)  # Ray wraps pyarrow.Schema
    n_edges = 0 if schema is None else edges.count()
    if schema is None or n_edges == 0:  # no edges → no ranked nodes
        typ = pa.string() if schema is None else schema.field(src).type
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], typ), "rank": pa.array([], pa.float64())})
        )

    # size-based plan choice (same rationale as connected_components): the
    # per-iteration exchanges are for edge lists too big for one machine;
    # below the cutoff run the identical recurrence with numpy bincounts.
    # GRAFT_PR_LOCAL_MAX=0 forces the distributed path.
    import os as _os

    local_max = int(_os.environ.get("GRAFT_PR_LOCAL_MAX", "1000000"))
    if n_edges <= local_max:
        import numpy as np

        from .agg import round_like_duckdb as _round

        t = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        s = t.column(src).combine_chunks()
        d = t.column(dst).combine_chunks()
        enc = pa.chunked_array([s, d]).combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary
        m = len(s)
        si, di = codes[:m], codes[m:]
        n = len(uniq)
        wv = None
        if weight is not None:
            wv = (
                pc.cast(t.column(weight), pa.float64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            outdeg = np.bincount(si, weights=wv, minlength=n)
        else:
            outdeg = np.bincount(si, minlength=n).astype(np.float64)
        # a src whose weight-sum is zero contributes 0 (defined semantics —
        # matches the distributed plan's zero-outdeg guard); unweighted
        # dangling srcs never appear in si, so the mask only bites weighted
        zero_out = outdeg == 0
        outdeg[zero_out] = 1.0
        if personalization is None:
            base_vec = np.full(n, (1.0 - damping) / n)
            rank = np.full(n, 1.0 / n)
        else:
            seed_arr = pa.array(list(personalization))
            is_seed = (
                pc.is_in(uniq, value_set=seed_arr)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            n_seeds_ = len(seed_arr)
            base_vec = np.where(is_seed, (1.0 - damping) / n_seeds_, 0.0)
            rank = np.where(is_seed, 1.0 / n_seeds_, 0.0)
        src_zero = zero_out[si] if wv is not None else None
        for _ in range(iters):
            c = rank[si] / outdeg[si]
            if wv is not None:
                c = c * wv
                if src_zero.any():
                    c = np.where(src_zero, 0.0, c)
            rank = base_vec + damping * np.bincount(di, weights=c, minlength=n)
        out = pa.array(rank, pa.float64())
        if round_to is not None:
            out = _round(out, round_to)
        return ray.data.from_arrow(pa.table({"node": uniq, "rank": out}))

    nodes = distinct_nodes(edges, src, dst, "node",
                           num_partitions=num_partitions)
    nodes = nodes.materialize()
    n_nodes = nodes.count()
    seeds = None
    if personalization is not None:
        seeds = pa.array(list(personalization))
        n_seeds = len(seeds)
    base = (1.0 - damping) / n_nodes

    if weight is None:
        outdeg = grouped_agg(edges, [src], [("outdeg", src, "count")],
                             num_partitions=num_partitions, sum_as_float=False)
    else:
        outdeg = grouped_agg(edges, [src], [("outdeg", weight, "sum")],
                             num_partitions=num_partitions)
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

    if seeds is None:
        init = 1.0 / n_nodes
        ranks = nodes.map_batches(
            lambda b: b.append_column(
                "rank", pa.array([init] * b.num_rows, pa.float64())
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        seed_init = 1.0 / n_seeds

        def init_personal(b: pa.Table) -> pa.Table:
            is_seed = pc.is_in(b.column("node"), value_set=seeds)
            r = pc.if_else(is_seed, pa.scalar(seed_init), pa.scalar(0.0))
            return b.append_column("rank", pc.cast(r, pa.float64()))

        ranks = nodes.map_batches(
            init_personal, batch_format="pyarrow"
        ).materialize()

    def post_contrib(t: pa.Table) -> pa.Table:
        # runs inside the src-keyed join reduce: partial per-dst sums
        od = pc.cast(t.column("outdeg"), pa.float64())
        c = pc.divide(t.column("rank"), od)
        if weight is not None:
            c = pc.multiply(c, pc.cast(t.column(weight), pa.float64()))
            # zero weight-sum src ⇒ contribution 0 (not inf/NaN) — keeps the
            # local and distributed plans identical on degenerate weights
            c = pc.if_else(pc.equal(od, 0.0), pa.scalar(0.0, pa.float64()), c)
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
        if seeds is None:
            base_col = pa.scalar(base)
        else:
            base_col = pc.cast(
                pc.if_else(
                    pc.is_in(node_col, value_set=seeds),
                    pa.scalar((1.0 - damping) / n_seeds),
                    pa.scalar(0.0),
                ),
                pa.float64(),
            )
        rank = pc.add(base_col, pc.multiply(pa.scalar(damping), contrib))
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
                 weight: str | None = None,
                 damping: float = 0.85, iters: int = 10,
                 round_to: int = 8) -> str:
    """The DuckDB oracle: the identical simplified PageRank as ``iters``
    UNROLLED chained CTEs (recursive CTEs disallow the needed aggregate).
    ``edges_sql`` is a SELECT producing (src, dst[, weight])."""
    odeg = f"sum({weight})" if weight else "count(*)"
    wmul = f" * e.{weight}" if weight else ""
    parts = [
        f"WITH edges AS ({edges_sql})",
        f"nodes AS (SELECT {src} AS node FROM edges "
        f"UNION SELECT {dst} AS node FROM edges)",
        "n AS (SELECT count(*) AS cnt FROM nodes)",
        f"outdeg AS (SELECT {src} AS node, {odeg} AS odeg "
        f"FROM edges GROUP BY 1)",
        "pr0 AS (SELECT node, 1.0 / (SELECT cnt FROM n) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"pr{i} AS (SELECT nodes.node, "
            f"(1 - {damping}) / (SELECT cnt FROM n) + {damping} * "
            f"COALESCE(s.c, 0) AS rank FROM nodes LEFT JOIN ("
            f"SELECT e.{dst} AS node, sum(p.rank{wmul} / outdeg.odeg) AS c "
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


def symmetrize(edges, src: str = "src", dst: str = "dst", *,
               num_partitions: int | None = None):
    """Undirected view: distinct union of (src,dst) and (dst,src)."""
    from .setops import set_op

    fwd = edges.map_batches(
        lambda b: pa.table({src: b.column(src), dst: b.column(dst)}),
        batch_format="pyarrow",
    )
    rev = edges.map_batches(
        lambda b: pa.table({src: b.column(dst), dst: b.column(src)}),
        batch_format="pyarrow",
    )
    return set_op(fwd, rev, "union", num_partitions=num_partitions)


def connected_components(edges, *, src: str = "src", dst: str = "dst",
                         max_iters: int = 50, num_partitions: int | None = None):
    """Distributed connected components by min-label propagation.

    Labels start as the node's own id; each round every node takes the min
    of its label, its neighbours' labels, AND its label's label (pointer
    jumping — halves the remaining chain every round, so rounds ≈
    O(log diameter) instead of O(diameter)), until a round changes nothing
    (capped at ``max_iters``).  Component id = the component's minimum node
    id — identical semantics to the driver-side union-find
    (:func:`pyjelly_ray.stages.sim.dup_clusters`), but nothing ever leaves
    the cluster: each of the two steps per round is one keyed pair join
    whose reduce folds per-node partial MIN candidates (``hash_join(post=)``)
    plus one pair exchange against the label table that applies
    ``min(own, candidate)`` and counts changes in place.  The convergence
    check reads ONE scalar per step (sum of per-partition change counts).

    Returns a Dataset ``(node, component)``.
    """
    import ray

    from ..state.exchange import default_partitions, hash_exchange_pair
    from .agg import bucket_codes
    from .joins import hash_join

    num_partitions = num_partitions or default_partitions()
    schema = edges.schema()
    schema = getattr(schema, "base_schema", schema)  # Ray wraps pyarrow.Schema
    n_edges = 0 if schema is None else edges.count()
    if schema is None or n_edges == 0:  # no edges → no components
        typ = pa.string() if schema is None else schema.field(src).type
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], typ), "component": pa.array([], typ)})
        )

    # size-based plan choice: the propagation rounds exist for edge lists
    # too big for one machine; a small list (near-dup pairs are usually a
    # tiny fraction of the corpus) pays ~2 exchanges × O(log d) rounds of
    # pure fixed cost.  Under the cutoff, collect the edges and run an
    # exact union-find (union-by-min ⇒ root IS the component minimum —
    # identical labels to the distributed path).  GRAFT_CC_LOCAL_MAX=0
    # forces the distributed path.
    import os as _os

    local_max = int(_os.environ.get("GRAFT_CC_LOCAL_MAX", "1000000"))
    if n_edges <= local_max:
        typ = schema.field(src).type
        t = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow")),
            promote_options="default",
        )
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(t.column(src).to_pylist(), t.column(dst).to_pylist()):
            if x is None or y is None:
                continue
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx  # attach larger root under smaller
        nodes = sorted(parent)
        comp = [find(x) for x in nodes]
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array(nodes, typ), "component": pa.array(comp, typ)}
            )
        )

    sym = symmetrize(edges, src, dst, num_partitions=num_partitions)
    sym = sym.materialize()

    labels = distinct_nodes(edges, src, dst, "node",
                            num_partitions=num_partitions)
    labels = labels.map_batches(
        lambda b: b.append_column("label", b.column("node")),
        batch_format="pyarrow",
    ).materialize()

    def post_min(t: pa.Table) -> pa.Table:
        # src-keyed join reduce: each edge offers its src's label to dst;
        # keep only the per-dst MIN as the partition's candidate partial
        part = (
            pa.table({dst: t.column(dst), "cand": t.column("label")})
            .group_by(dst)
            .aggregate([("cand", "min")])
            .rename_columns([dst, "cand"])
        )
        return part.append_column(
            "__bucket", pa.array(bucket_codes(part, [dst], num_partitions))
        )

    def reduce_update(cp: pa.Table, lp: pa.Table) -> pa.Table:
        if "__bucket" in lp.column_names:
            lp = lp.drop_columns(["__bucket"])
        old = lp.column("label")
        if dst in cp.column_names:
            if "__bucket" in cp.column_names:
                cp = cp.drop_columns(["__bucket"])
            cand = cp.group_by(dst).aggregate([("cand", "min")])
            joined = lp.join(
                cand, keys=["node"], right_keys=[dst], join_type="left outer"
            )
            new = pc.min_element_wise(
                joined.column("label"),
                pc.coalesce(joined.column("cand_min"), joined.column("label")),
            )
            node_col = joined.column("node")
            old = joined.column("label")
        else:
            new = old
            node_col = lp.column("node")
        changed = pc.cast(pc.not_equal(new, old), pa.int64())
        return pa.table({"node": node_col, "label": new, "__changed": changed})

    def post_jump(t: pa.Table) -> pa.Table:
        # label-of-label: each node's candidate is its current label's label
        part = (
            pa.table({dst: t.column("node"), "cand": t.column("label2")})
            .group_by(dst)
            .aggregate([("cand", "min")])
            .rename_columns([dst, "cand"])
        )
        return part.append_column(
            "__bucket", pa.array(bucket_codes(part, [dst], num_partitions))
        )

    def bucketed(ls):
        return ls.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "label": b.column("label")}
            ).append_column(
                "__bucket",
                pa.array(bucket_codes(b, ["node"], num_partitions)),
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    def apply_step(offered, lb):
        updated = hash_exchange_pair(
            offered,
            lb,
            left_bucket_col="__bucket",
            right_bucket_col="__bucket",
            n_partitions=num_partitions,
            reduce_fn=reduce_update,
        ).materialize()
        n_changed = updated.sum("__changed")
        new_labels = updated.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "label": b.column("label")}
            ),
            batch_format="pyarrow",
        ).materialize()
        return new_labels, n_changed

    for _ in range(max_iters):
        # neighbour propagation
        offered = hash_join(
            sym, labels, left_key=src, right_key="node",
            num_partitions=num_partitions, post=post_min,
        )
        labels, changed_nb = apply_step(offered, bucketed(labels))
        # pointer jump: label ← label(label)
        ren = labels.map_batches(
            lambda b: pa.table(
                {"node2": b.column("node"), "label2": b.column("label")}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        jumped = hash_join(
            labels, ren, left_key="label", right_key="node2",
            num_partitions=num_partitions, post=post_jump,
        )
        labels, changed_jump = apply_step(jumped, bucketed(labels))
        if not changed_nb and not changed_jump:
            break

    return labels.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "component": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def bfs_distances(edges, sources, *, src: str = "src", dst: str = "dst",
                  directed: bool = False, max_iters: int = 50,
                  num_partitions: int | None = None):
    """Single-source(-set) BFS hop distances by distributed min-plus
    label propagation.

    Every node starts at distance 0 (members of ``sources``) or NULL
    (unreached); each round every edge offers ``dist(src) + 1`` to its
    dst and nodes keep the element-wise MIN — exactly the relaxation a
    recursive-CTE shortest-hop SQL performs, so the DuckDB oracle is
    bit-comparable.  Per round: ONE keyed edge⋈labels join whose reduce
    folds per-dst MIN candidate partials (``hash_join(post=)``) plus one
    pair exchange that applies ``min(own, candidate)`` in place and counts
    changes; convergence reads a single scalar per round.  Rounds =
    eccentricity of the source set (plain BFS has no pointer-jumping
    shortcut — distances aren't idempotent under relabeling), so this is
    O(diameter) exchanges; node/edge tables never leave the cluster.

    The node universe is the edge endpoints: a source absent from the
    graph is dropped.  Returns ``(node, dist)`` with NULL dist for
    unreachable nodes.
    """
    import ray

    from ..state.exchange import default_partitions, hash_exchange_pair
    from .agg import bucket_codes
    from .joins import hash_join

    num_partitions = num_partitions or default_partitions()
    schema = edges.schema()
    schema = getattr(schema, "base_schema", schema)
    if schema is None or edges.count() == 0:
        typ = pa.string() if schema is None else schema.field(src).type
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], typ), "dist": pa.array([], pa.int64())})
        )

    graph = edges if directed else symmetrize(
        edges, src, dst, num_partitions=num_partitions
    )
    graph = graph.materialize()
    node_type = schema.field(src).type
    source_set = pa.array(list(sources), node_type)

    labels = distinct_nodes(edges, src, dst, "node",
                            num_partitions=num_partitions)

    def init_dist(b: pa.Table) -> pa.Table:
        is_src = pc.is_in(b.column("node"), value_set=source_set)
        d = pc.if_else(is_src, pa.scalar(0, pa.int64()),
                       pa.scalar(None, pa.int64()))
        return pa.table({"node": b.column("node"), "dist": d})

    labels = labels.map_batches(init_dist, batch_format="pyarrow").materialize()

    def post_min(t: pa.Table) -> pa.Table:
        # edge⋈labels reduce: each edge offers dist(src)+1 to its dst;
        # keep only the per-dst MIN as this partition's candidate partial
        cand = pc.add(t.column("dist"), pa.scalar(1, pa.int64()))
        part = pa.table({dst: t.column(dst), "cand": cand})
        part = part.filter(pc.is_valid(part.column("cand")))
        part = (
            part.group_by(dst).aggregate([("cand", "min")])
            .rename_columns([dst, "cand"])
        )
        return part.append_column(
            "__bucket", pa.array(bucket_codes(part, [dst], num_partitions))
        )

    def reduce_update(cp: pa.Table, lp: pa.Table) -> pa.Table:
        if "__bucket" in lp.column_names:
            lp = lp.drop_columns(["__bucket"])
        old = lp.column("dist")
        node_col = lp.column("node")
        new = old
        if dst in cp.column_names and cp.num_rows:
            if "__bucket" in cp.column_names:
                cp = cp.drop_columns(["__bucket"])
            cand = cp.group_by(dst).aggregate([("cand", "min")])
            joined = lp.join(
                cand, keys=["node"], right_keys=[dst], join_type="left outer"
            )
            # min_element_wise skips nulls: NULL old takes the candidate,
            # NULL candidate keeps old, both NULL stays NULL
            new = pc.min_element_wise(
                joined.column("dist"), joined.column("cand_min")
            )
            node_col = joined.column("node")
            old = joined.column("dist")
        neg = pa.scalar(-1, pa.int64())  # dist ≥ 0 → safe NULL sentinel
        changed = pc.cast(
            pc.not_equal(pc.fill_null(new, neg), pc.fill_null(old, neg)),
            pa.int64(),
        )
        return pa.table({"node": node_col, "dist": new, "__changed": changed})

    def bucketed(ls):
        return ls.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "dist": b.column("dist")}
            ).append_column(
                "__bucket",
                pa.array(bucket_codes(b, ["node"], num_partitions)),
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    for _ in range(max_iters):
        offered = hash_join(
            graph, labels, left_key=src, right_key="node",
            num_partitions=num_partitions, post=post_min,
        )
        updated = hash_exchange_pair(
            offered,
            bucketed(labels),
            left_bucket_col="__bucket",
            right_bucket_col="__bucket",
            n_partitions=num_partitions,
            reduce_fn=reduce_update,
        ).materialize()
        n_changed = updated.sum("__changed")
        labels = updated.map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "dist": b.column("dist")}
            ),
            batch_format="pyarrow",
        ).materialize()
        if not n_changed:
            break

    return labels


def kcore(edges, *, src: str = "src", dst: str = "dst", k: int = 2,
          max_rounds: int = 100):
    """k-core decomposition of a BIPARTITE graph: iteratively peel nodes
    of degree < k on either side until a fixpoint — the classic
    density/denoising filter before community detection or dedup-graph
    clustering.  Each round is two combiner-exchange degree counts + two
    broadcast semi-filters over the (shrinking, materialized) edge set;
    rounds are O(peel depth), convergence is one scalar ``count()`` read
    per round (the same driver-loop discipline as :func:`pagerank`).
    Returns the surviving edges.  Inputs are deduped first so degree =
    distinct-neighbor count."""
    from ..stages.agg import grouped_agg
    from ..stages.joins import broadcast_semi

    cur = grouped_agg(edges, [src, dst], [("__n", src, "count")]).map_batches(
        lambda b: b.select([src, dst]), batch_format="pyarrow"
    ).materialize()
    n = cur.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        def deg_ge_k(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(
                pc.cast(b.column("d"), pa.int64()), pa.scalar(k, pa.int64())))

        sdeg = grouped_agg(cur, [src], [("d", src, "count")],
                           sum_as_float=False)
        skeep = sdeg.map_batches(deg_ge_k, batch_format="pyarrow")
        ddeg = grouped_agg(cur, [dst], [("d", dst, "count")],
                           sum_as_float=False)
        dkeep = ddeg.map_batches(deg_ge_k, batch_format="pyarrow")
        nxt = broadcast_semi(cur, skeep, left_key=src, right_key=src)
        nxt = broadcast_semi(nxt, dkeep, left_key=dst, right_key=dst)
        nxt = nxt.materialize()
        n2 = nxt.count()
        if n2 == n:
            return nxt
        cur, n = nxt, n2
    return cur


def eigencentrality(edges, *, src: str = "src", dst: str = "dst",
                    iters: int = 5, num_partitions: int | None = None,
                    round_to: int | None = 8):
    """Eigenvector centrality by power iteration over a (pre-symmetrized
    if undirected) edge Dataset: x ← A·x / ‖A·x‖₂, starting from the
    all-ones vector over the nodes that appear in the edge list.

    Per iteration: one ``hash_join(post=)`` on ``src`` whose reduce folds
    per-``dst`` PARTIAL contribution sums (exchange output ≤ |dst ∩
    partition| rows), one combiner merge, one scalar L2-norm fold (the
    only driver value), one broadcast divide — O(|edges|/cluster), no
    driver vectors, same scale shape as :func:`pagerank`.  Nodes whose
    in-neighborhood sums to zero keep centrality 0 through the left
    join with the node table.

    Returns ``(node, centrality)`` rounded to ``round_to``.
    """
    import numpy as np
    import ray

    from ..state.exchange import default_partitions
    from .agg import grouped_agg, round_like_duckdb
    from .joins import hash_join

    num_partitions = num_partitions or default_partitions()
    schema = edges.schema()
    schema = getattr(schema, "base_schema", schema)
    if schema is None or edges.count() == 0:
        typ = pa.string() if schema is None else schema.field(src).type
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], typ),
            "centrality": pa.array([], pa.float64())}))
    edges = edges.materialize()
    nodes = distinct_nodes(edges, src, dst, "node",
                           num_partitions=num_partitions).materialize()

    x = nodes.map_batches(
        lambda b: b.append_column(
            "centrality", pa.array([1.0] * b.num_rows, pa.float64())),
        batch_format="pyarrow").materialize()

    def post_contrib(t: pa.Table) -> pa.Table:
        part = (t.select([dst, "centrality"])
                .group_by(dst).aggregate([("centrality", "sum")]))
        return part.rename_columns([dst, "c"])

    for _ in range(iters):
        contrib = hash_join(edges, x, left_key=src, right_key="node",
                            num_partitions=num_partitions,
                            post=post_contrib)
        summed = grouped_agg(contrib, [dst], [("c", "c", "sum")],
                             num_partitions=num_partitions)
        nrm_t = summed.map_batches(
            lambda b: pa.table({"q": pa.array(
                [pc.sum(pc.multiply(b.column("c"),
                                    b.column("c"))).as_py() or 0.0],
                pa.float64())}),
            batch_format="pyarrow")
        sq = 0.0
        for blk in nrm_t.iter_batches(batch_format="pyarrow"):
            if blk.num_columns and blk.num_rows:
                v = pc.sum(blk.column("q")).as_py()
                sq += v if v is not None else 0.0
        nrm = float(np.sqrt(sq)) if sq > 0.0 else 1.0

        def renorm(b: pa.Table, _n=nrm) -> pa.Table:
            return pa.table({
                "node": b.column(dst),
                "centrality": pc.divide(b.column("c"),
                                        pa.scalar(_n, pa.float64()))})

        # iterate on the nonzero support only: a node absent from `summed`
        # has centrality 0 and contributes 0 to every later matvec and to
        # the L2 norm, so the zero-fill join is done ONCE after the loop
        # instead of per iteration (ADVICE r1 — saves iters-1 exchanges)
        x = summed.map_batches(renorm, batch_format="pyarrow").materialize()

    absent = hash_join(nodes, x, left_key="node",
                       right_key="node", how="left anti",
                       num_partitions=num_partitions)
    absent0 = absent.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "centrality": pa.array([0.0] * b.num_rows,
                                   pa.float64())}),
        batch_format="pyarrow")
    x = x.union(absent0)

    if round_to is not None:
        x = x.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "centrality": round_like_duckdb(b.column("centrality"),
                                                round_to)}),
            batch_format="pyarrow")
    return x
