"""Similarity search over embedding columns (list<float>).

- :func:`cosine_topk` — brute-force baseline: the query matrix is broadcast
  once (``ray.put``); each batch does one numpy matmul and emits only its
  local top-k, then a tiny global sort+limit merges candidates.  Shuffle
  volume is O(k × blocks), not O(rows).
- :func:`cosine_threshold` — range search (all rows with sim ≥ τ).
- :func:`ivf_build` / :func:`ivf_topk` — the scale path: deterministic
  coarse centroids, per-row bucket assignment (one shuffleless map), query
  probes only the closest ``nprobe`` buckets.  Partitioning assumption:
  bucket column can be used as a partition key for locality at 100 TB.
- Embedding near-dup pairs via random-hyperplane LSH + cosine verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _stack(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy-ish.

    Uniform-length lists (the embedding case) reshape the flattened
    values buffer directly; ragged input falls back to ``to_pylist``.
    """
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.float64)
    lens = np.diff(arr.offsets.to_numpy())
    if arr.null_count == 0 and lens.min() == lens.max():
        values = arr.flatten().to_numpy(zero_copy_only=False)
        return values.reshape(n, int(lens[0])).astype(np.float64)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=-1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKScorer:
    """Per-batch scorer: sims vs broadcast query, local top-k only."""

    def __init__(self, query_ref, k: int, id_col: str, round_to: int | None) -> None:
        import ray

        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64).reshape(1, -1))[0]
        self.k = k
        self.id_col = id_col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        m = _normalize(_stack(batch))
        sims = m @ self.q
        if self.round_to is not None:
            # round BEFORE the local cut so ties at the k-th rounded value
            # all survive to the global (sim desc, id asc) sort — otherwise a
            # tied row with a smaller id could be dropped here yet belong in
            # the deterministic global top-k
            sims = np.round(sims, self.round_to)
        k = min(self.k, len(sims))
        kth = -np.partition(-sims, k - 1)[k - 1]
        idx = np.flatnonzero(sims >= kth)
        ids = pc.take(batch.column(self.id_col), pa.array(idx, pa.int64()))
        return pa.table({self.id_col: ids, "sim": pa.array(sims[idx], pa.float64())})


def cosine_topk(ds, query, k: int = 10, *, id_col: str = "vec_id", round_to: int | None = None):
    from .agg import global_topk

    # task pool (scorer state = one query vector) + exchange-based top-k
    # merge — no actor-pool startup, no full sort shuffle
    local = ds.map_batches(
        _TopKScorer(np.asarray(query, dtype=np.float64), k, id_col, round_to),
        batch_format="pyarrow",
        batch_size=None,
    )
    return global_topk(local, ["sim", id_col], k, descending=[True, False])


def cosine_threshold(ds, query, tau: float, *, id_col: str = "vec_id", round_to: int | None = None):
    """All ids with cosine similarity ≥ tau vs the broadcast query vector."""
    qv = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]

    def thresh(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        m = _normalize(_stack(batch))
        sims = m @ qv
        if round_to is not None:
            sims = np.round(sims, round_to)  # round BEFORE thresholding
        mask = sims >= tau  # (matches the SQL oracle's rounded filter)
        ids = batch.column(id_col).filter(pa.array(mask))
        return pa.table({id_col: ids, "sim": pa.array(sims[mask], pa.float64())})

    return ds.map_batches(thresh, batch_format="pyarrow", batch_size=None)


# ------------------------------- IVF ----------------------------------------


def ivf_centroids(ds, n_centroids: int = 16, *, col: str = "embedding") -> np.ndarray:
    """Deterministic coarse centroids: first n rows by id (no k-means pass;
    good enough for bucketing, replaceable by minibatch k-means later)."""
    head = ds.limit(n_centroids).take_all()
    m = np.asarray([r[col] for r in head], dtype=np.float64)
    return _normalize(m)


def ivf_assign(ds, centroids: np.ndarray, *, col: str = "embedding"):
    """Add a ``bucket`` column = argmax cosine vs centroids (shuffleless map).

    The centroid matrix is tiny (n_centroids × dim floats), so it ships in
    the task closure — no actor pool, no broadcast ref needed.  At a truly
    large centroid count, switch to ``ray.put`` + an actor pool.
    """

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int32()))
        m = _normalize(_stack(batch, col))
        bucket = (m @ centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def ivf_topk(assigned_ds, centroids: np.ndarray, query, k: int = 10, nprobe: int = 4,
             *, id_col: str = "vec_id", round_to: int | None = None):
    """Probe the ``nprobe`` nearest buckets only, then brute-force top-k."""
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    probe = np.argsort(-(centroids @ q))[:nprobe].tolist()
    probe_arr = pa.array(probe, pa.int32())
    filtered = assigned_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("bucket"), value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return cosine_topk(filtered, query, k, id_col=id_col, round_to=round_to)


# --------------------- embedding near-dup (LSH + verify) ---------------------


def embedding_dup_pairs(ds, *, tau: float = 0.9, n_planes: int = 16, seed: int = 42,
                        id_col: str = "vec_id"):
    """Random-hyperplane LSH buckets → exact cosine verify within bucket."""
    rng = np.random.RandomState(seed)

    def sig(batch: pa.Table) -> pa.Table:
        planes = rng.standard_normal((n_planes, len(batch.column("embedding")[0])))
        # NOTE: rng use above would differ per batch — regenerate per call:
        local_rng = np.random.RandomState(seed)
        planes = local_rng.standard_normal((n_planes, _stack(batch).shape[1]))
        m = _normalize(_stack(batch))
        bits = (m @ planes.T) > 0
        keys = ["".join("1" if b else "0" for b in row) for row in bits]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(keys, pa.string()),
                "embedding": batch.column("embedding"),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = group.column(id_col).to_pylist()
        m = _normalize(_stack(group))
        a_out, b_out, s_out = [], [], []
        order = np.argsort(ids)
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                if ids[i] == ids[j]:
                    continue
                s = float(m[i] @ m[j])
                if s >= tau:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    s_out.append(round(s, 6))
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )

    from .agg import grouped_map

    bucketed = ds.map_batches(sig, batch_format="pyarrow")
    return grouped_map(bucketed, "bucket", pairs)
