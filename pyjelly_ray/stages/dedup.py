"""Exact statement dedup (SURVEY.md §2.5) — the pipeline's big shuffle.

Scale-aware design (measured, see BASELINE.md):

1. **Vectorized keys**: the statement key is a 128-bit hash (two seeded
   64-bit xxhashes via polars — no per-row Python; 64-bit alone would
   collide ~n²/2⁶⁵ times at 10¹²-row scale, 128-bit is safe).  The int
   shuffle ``bucket`` comes from the same hash.
2. **Local pre-dedup** inside ``map_batches`` (no shuffle): per-batch Arrow
   ``group_by`` keeps the min-packed row per key — the combiner that
   shrinks the all-to-all exchange to distinct-per-block.
3. **Global dedup sharded by the int bucket**: Ray's sort shuffle on a
   small-int column with a bounded block count, then one vectorized Arrow
   ``group_by`` per bucket.
4. The representative row is the minimum ``(repo, path, seq)`` — ``packed``
   strings order by that prefix — deterministic under any execution order.

Skew: bucket keys are uniform hash values — no salting needed here (hot
*repos* skew the writer partitioning; handled in sinks/jelly_sink.py).

Constraint: packed columns must not contain 0x1f/0x00 control chars (RDF
IRIs/identifiers never do; code-corpus literals don't either).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

STMT_COLS = ("s_kind", "s_value", "p_kind", "p_value", "o_kind", "o_value", "o_lex", "o_lang", "o_dt")
_LINEAGE = ("repo", "path", "seq", "content_sha256")
_SEP = "\x1f"
_NULL = "\x00"

#: global dedup fan-out; at 100 TB raise to ~#cores in the cluster
N_BUCKETS = 64


def _joined_stmt(batch: pa.Table) -> pa.ChunkedArray:
    cols = []
    for c in STMT_COLS:
        if c in batch.column_names:
            col = batch.column(c)
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            cols.append(pc.coalesce(col, pa.scalar(_NULL)))
    return pc.binary_join_element_wise(*cols, _SEP)


def add_tkey(batch: pa.Table, n_buckets: int = N_BUCKETS) -> pa.Table:
    """Vectorized 128-bit statement key (h1, h2) + int shuffle bucket."""
    import polars as pl

    joined = _joined_stmt(batch)
    s = pl.Series("j", joined.combine_chunks())
    h1 = s.hash(seed=1).to_arrow()
    h2 = s.hash(seed=2).to_arrow()
    bucket = pc.cast(pc.bit_wise_and(h1, pa.scalar(0x7FFFFFFF, pa.uint64())), pa.int64())
    bucket = pc.cast(
        pc.subtract(bucket, pc.multiply(pc.divide(bucket, n_buckets), n_buckets)),
        pa.int32(),
    )
    for c in ("h1", "h2", "bucket"):
        if c in batch.column_names:
            batch = batch.drop_columns([c])
    batch = batch.append_column("h1", h1)
    batch = batch.append_column("h2", h2)
    return batch.append_column("bucket", bucket)


def _pack_order(batch: pa.Table) -> list:
    """Columns joined into one string; prefix = (repo, path, seq) order key."""
    parts = []
    for c in _LINEAGE:
        if c in batch.column_names:
            col = batch.column(c)
            if c == "seq":
                col = pc.utf8_lpad(pc.cast(col, pa.string()), 10, "0")
            parts.append(pc.coalesce(col, pa.scalar(_NULL)))
    for c in STMT_COLS:
        if c in batch.column_names:
            col = batch.column(c)
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(pc.coalesce(col, pa.scalar(_NULL)))
    return parts


def pack_rows(batch: pa.Table) -> pa.Table:
    packed = pc.binary_join_element_wise(*_pack_order(batch), _SEP)
    return pa.table(
        {
            "bucket": batch.column("bucket"),
            "h1": batch.column("h1"),
            "h2": batch.column("h2"),
            "packed": packed,
        }
    )


def _min_packed_per_key(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["bucket", "h1", "h2"]).aggregate([("packed", "min")])
    return g.select(["bucket", "h1", "h2", "packed_min"]).rename_columns(
        ["bucket", "h1", "h2", "packed"]
    )


def local_prededup(batch: pa.Table) -> pa.Table:
    """Combiner: keep the min-packed row per key within this batch."""
    if batch.num_rows == 0:
        return batch
    return _min_packed_per_key(batch)


def unpack_rows(batch: pa.Table) -> pa.Table:
    """Inverse of pack_rows → full statement + lineage schema."""
    parts = pc.split_pattern(batch.column("packed"), _SEP)
    names = list(_LINEAGE) + list(STMT_COLS)
    out: dict[str, object] = {}
    for i, name in enumerate(names):
        col = pc.list_element(parts, i)
        col = pc.if_else(pc.equal(col, _NULL), pa.scalar(None, pa.string()), col)
        if name == "seq":
            col = pc.cast(col, pa.int32())
        elif name.endswith("_kind"):
            col = pc.cast(col, pa.uint8())
        out[name] = col
    return pa.table(out)


def dedup_exact(ds, n_buckets: int = N_BUCKETS):
    """Dataset-level exact dedup; deterministic representative per key.

    add_tkey+pack (map_batches) → local combine → bucket groupby (int-key
    shuffle) with vectorized per-bucket Arrow dedup → unpack.
    """
    packed = (
        ds.map_batches(lambda b: add_tkey(b, n_buckets), batch_format="pyarrow")
        .map_batches(pack_rows, batch_format="pyarrow")
        .map_batches(local_prededup, batch_format="pyarrow")
    )
    deduped = packed.groupby("bucket").map_groups(
        _min_packed_per_key, batch_format="pyarrow"
    )
    return deduped.map_batches(unpack_rows, batch_format="pyarrow")
