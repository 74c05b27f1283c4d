"""Deterministic sampling / dataset splitting (training-data operators).

A training pipeline needs train/val/test assignment that is (a) stable
across runs and cluster sizes, (b) embarrassingly parallel (no shuffle, no
global state), and (c) auditable by an independent engine.  Both operators
here hash a row's id with sha256 and compare the first 8 hex chars against
precomputed thresholds — pure per-batch ``map_batches``, zero shuffles,
and byte-reproducible against DuckDB's ``sha256()`` (verified identical to
``hashlib``).

At 100 TB scale this is the right shape: the split decision rides along
with every row (one short hash per row, hashlib's C core via a list
comprehension — the id strings are tiny and this runs once per corpus),
no coordination, no sampling skew from partition boundaries.

- :func:`split_thresholds` — cumulative fractions → 8-hex-char bounds.
- :func:`deterministic_split` — add a ``split`` column ("train"/"val"/...).
- :func:`hash_sample` — keep a deterministic fraction of rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SPACE = 16 ** 8  # first 8 hex chars of sha256 → uniform uint32 space


def split_thresholds(splits: list[tuple[str, float]]) -> list[tuple[str, int]]:
    """Cumulative upper bounds (exclusive) in the 32-bit hash space.

    The last split absorbs any rounding remainder so every row lands
    somewhere.  Bounds are integers so the SQL oracle can compare the hex
    prefix lexicographically against ``format(bound, '08x')``.
    """
    total = sum(f for _, f in splits)
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    for i, (name, frac) in enumerate(splits):
        cum += frac / total
        bound = _SPACE if i == len(splits) - 1 else int(cum * _SPACE)
        bounds.append((name, bound))
    return bounds


def _hash_ints(ids, seed: str) -> np.ndarray:
    pre = seed.encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha256(pre + str(v).encode()).digest()[:4], "big")
            for v in ids.to_pylist()
        ),
        dtype=np.uint32,
        count=len(ids),
    )


def deterministic_split(ds, *, id_col: str, splits: list[tuple[str, float]],
                        seed: str = "", out_col: str = "split"):
    """Assign each row to a named split by hashing ``id_col``.

    ``splits`` is ``[("train", 0.8), ("val", 0.1), ("test", 0.1)]``-style;
    fractions are normalized.  ``seed`` prefixes the hashed string, so a
    new seed reshuffles assignments while staying deterministic.
    """
    bounds = split_thresholds(splits)
    names = np.array([n for n, _ in bounds])
    edges = np.array([b for _, b in bounds[:-1]], dtype=np.uint64)

    def assign(b: pa.Table) -> pa.Table:
        h = _hash_ints(b.column(id_col), seed)
        idx = np.searchsorted(edges, h, side="right")
        return b.append_column(out_col, pa.array(names[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def hash_sample(ds, *, id_col: str, fraction: float, seed: str = ""):
    """Keep a deterministic ``fraction`` of rows (hash(id) < fraction·2^32)."""
    bound = int(fraction * _SPACE)

    def keep(b: pa.Table) -> pa.Table:
        h = _hash_ints(b.column(id_col), seed)
        return b.filter(pa.array(h < bound))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def sql_split_case(id_expr: str, splits: list[tuple[str, float]],
                   seed: str = "") -> str:
    """The DuckDB CASE expression computing the identical split column.

    Compares ``substr(sha256(seed || id), 1, 8)`` (lowercase hex)
    lexicographically — monotone with the integer value, so it equals the
    numpy ``searchsorted`` assignment bit-for-bit.
    """
    prefix = f"substr(sha256('{seed}' || {id_expr}), 1, 8)"
    bounds = split_thresholds(splits)
    arms = [
        f"WHEN {prefix} < '{bound:08x}' THEN '{name}'"
        for name, bound in bounds[:-1]
    ]
    return "CASE " + " ".join(arms) + f" ELSE '{bounds[-1][0]}' END"


def stratified_sample(ds, *, keys: list[str] | str, id_col: str, k: int,
                      seed: str = ""):
    """Deterministic k-per-group sample: the k rows with the smallest
    ``sha256(seed || id)`` in each group.

    Unlike ``fraction``-based sampling this guarantees EXACTLY min(k, |group|)
    rows per stratum, independent of group size — the shape used for
    balanced eval sets and per-language probes.  Determinism comes from the
    hash order (stable across runs, partitionings and cluster sizes), and
    the heavy lifting is :func:`~pyjelly_ray.stages.agg.grouped_topk`'s
    map-side cut, so the exchange carries ≤ k·|groups| rows per block.
    Ties on the 32-bit hash prefix break by ``id_col``, mirroring the SQL
    ``ORDER BY substr(sha256(...),1,8), id`` oracle exactly.
    """
    from .agg import grouped_topk

    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_hash(b: pa.Table) -> pa.Table:
        h = _hash_ints(b.column(id_col), seed)
        return b.append_column("__h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
    picked = grouped_topk(
        hashed, keys, "__h", k, descending=False, tiebreak=[id_col]
    )
    return picked.map_batches(
        lambda b: b.drop_columns(["__h"]), batch_format="pyarrow", batch_size=None
    )


def weighted_hash_sample(ds, *, id_col: str, weight_col: str,
                         max_weight: float, seed: str = ""):
    """Deterministic importance sampling: keep a row with probability
    ``min(1, weight / max_weight)``, decided by its id hash.

    Same zero-shuffle, audit-reproducible contract as :func:`hash_sample`
    (the keep decision is a pure function of the row), but the threshold
    scales per row — the importance/temperature downsampling used to
    rebalance training mixtures.  ``max_weight`` is a constant (pass a
    known cap or a precomputed global max); the per-row bound is
    ``floor(weight / max_weight · 2^32)`` computed identically here and
    in the SQL oracle (same IEEE ops), so the driver hash-compare is
    exact.
    """
    scale = float(_SPACE)

    def keep(b: pa.Table) -> pa.Table:
        h = _hash_ints(b.column(id_col), seed).astype(np.uint64)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # weights at/above the cap keep unconditionally (bound would
        # overflow the 32-bit hash space and break the SQL hex compare)
        frac = np.clip(w / float(max_weight), 0.0, None)
        bound = np.floor(np.minimum(frac, 1.0) * scale).astype(np.uint64)
        mask = (w >= float(max_weight)) | (h < bound)
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def sql_weighted_sample_predicate(id_expr: str, weight_expr: str,
                                  max_weight: float, seed: str = "") -> str:
    """The DuckDB WHERE predicate computing the identical keep decision."""
    return (
        f"({weight_expr} >= {max_weight!r} OR "
        f"substr(sha256('{seed}' || {id_expr}), 1, 8) < "
        f"printf('%08x', CAST(floor({weight_expr} / {max_weight!r} "
        f"* 4294967296.0) AS BIGINT)))"
    )


def pack_sequences(ds, *, id_col: str, len_col: str, max_len: int,
                   num_partitions: int | None = None,
                   pack_col: str = "pack_id", pos_col: str = "pack_pos"):
    """Greedy sequence packing: assign documents to fixed-capacity packs
    (Σ len ≤ ``max_len``) — the assemble-training-batches operator that
    turns ragged documents into dense LM training sequences.

    Packing is PARTITION-LOCAL first-fit-decreasing: one hash exchange by
    ``id_col`` (deterministic layout), per partition a (len desc, id)
    sort and a vectorized-bookkeeping FFD fold; pack ids are globally
    unique as ``partition · 2³² + local``.  FFD wastes ≤ ~22% vs optimal
    in the worst case and far less in practice; cross-partition packing
    would serialize the fold for marginal density.  Documents LONGER than
    ``max_len`` get a singleton pack (the caller chunks upstream).
    Output: ``id_col, len, pack_id, pack_pos`` (position within pack).
    """
    import numpy as np

    from ..state.exchange import default_partitions, hash_exchange
    from .agg import bucket_codes

    num_partitions = num_partitions or default_partitions()

    def project(b: pa.Table) -> pa.Table:
        out = b.select([id_col, len_col])
        return out.append_column(
            "__bucket", pa.array(bucket_codes(out, [id_col], num_partitions))
        )

    def reduce_part(t: pa.Table) -> pa.Table:
        import numpy as np

        has_bucket = "__bucket" in t.column_names
        part = int(t.column("__bucket")[0].as_py()) if (has_bucket and t.num_rows) else 0
        if has_bucket:
            t = t.drop_columns(["__bucket"])
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                len_col: pa.array([], t.schema.field(len_col).type),
                pack_col: pa.array([], pa.int64()),
                pos_col: pa.array([], pa.int64()),
            })
        t = t.sort_by([(len_col, "descending"), (id_col, "ascending")])
        lens = t.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(lens)
        pack_of = np.empty(n, np.int64)
        pos_of = np.empty(n, np.int64)
        free: list[int] = []     # remaining capacity per open pack
        counts: list[int] = []   # items per pack
        for i in range(n):
            ln = int(lens[i])
            placed = -1
            if ln <= max_len:
                # first fit over open packs (bounded: packs ~ n·len/max_len)
                for p, cap in enumerate(free):
                    if cap >= ln:
                        placed = p
                        break
            if placed < 0:
                free.append(max_len)
                counts.append(0)
                placed = len(free) - 1
            pack_of[i] = placed
            pos_of[i] = counts[placed]
            counts[placed] += 1
            free[placed] -= ln
        return pa.table({
            id_col: t.column(id_col),
            len_col: t.column(len_col),
            pack_col: pa.array(part * (1 << 32) + pack_of, pa.int64()),
            pos_col: pa.array(pos_of, pa.int64()),
        })

    projected = ds.map_batches(project, batch_format="pyarrow",
                               batch_size=None)
    return hash_exchange(
        projected,
        bucket_col="__bucket",
        n_partitions=num_partitions,
        reduce_fn=reduce_part,
        reduce_empty=True,
    )


def weighted_sample_k(ds, *, id_col: str, weight_col: str, k: int,
                      seed: str = ""):
    """EXACT-k weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row gets the key ``u^(1/w)`` with ``u`` a deterministic
    uniform from ``sha256(seed || id)``; the k LARGEST keys are precisely
    a weighted sample without replacement.  Fully distributed and
    shuffle-light — the key is computed map-side and the cut is
    :func:`~pyjelly_ray.stages.agg.global_topk` (k rows per block to the
    driver-side merge).  Deterministic for a fixed seed; rows with
    non-positive or null weight are excluded.
    """
    import numpy as np

    from .agg import global_topk

    def key_fn(b: pa.Table) -> pa.Table:
        import numpy as np

        h = _hash_ints(b.column(id_col), seed).astype(np.float64)
        u = (h + 0.5) / float(_SPACE)  # uniform in (0, 1)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, u ** (1.0 / w), -1.0)
        out = b.append_column("__es_key", pa.array(key, pa.float64()))
        return out.filter(pa.array(key > 0))

    keyed = ds.map_batches(key_fn, batch_format="pyarrow", batch_size=None)
    top = global_topk(keyed, ["__es_key", id_col], k,
                      descending=[True, False])
    return top.map_batches(
        lambda b: b.drop_columns(["__es_key"]), batch_format="pyarrow"
    )
