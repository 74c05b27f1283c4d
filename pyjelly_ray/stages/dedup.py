"""Exact statement dedup (SURVEY.md §2.5) — the pipeline's big shuffle.

Scale-aware design (measured, not guessed — see BASELINE.md):

1. **Local pre-dedup** inside ``map_batches`` (no shuffle): per-batch Arrow
   ``group_by`` keeps the min-packed row per key — the combiner that
   shrinks the all-to-all exchange to distinct-per-block.
2. **Global dedup sharded by an int bucket**: the shuffle key is
   ``bucket = first_byte(blake2b(statement)) % P`` (computed for free while
   hashing) — Ray's sort shuffle on a small-int column is ~3× faster than
   sorting 32-char string keys, and each bucket group is deduped with one
   vectorized Arrow ``group_by('tkey').min('packed')``.
3. The representative row is the minimum ``(repo, path, seq)`` — ``packed``
   strings order by that prefix — so the result is deterministic regardless
   of execution order.

Skew: bucket keys are uniform hash bytes — no salting needed here (hot
*repos* skew the writer partitioning; handled in sinks/jelly_sink.py).

Constraint: packed columns must not contain 0x1f/0x00 control chars (RDF
IRIs/identifiers never do; code-corpus literals don't either).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

STMT_COLS = ("s_kind", "s_value", "p_kind", "p_value", "o_kind", "o_value", "o_lex", "o_lang", "o_dt")
_LINEAGE = ("repo", "path", "seq", "content_sha256")
_SEP = "\x1f"
_NULL = "\x00"

#: global dedup fan-out; at 100 TB raise to ~#cores in the cluster
N_BUCKETS = 64


def add_tkey(batch: pa.Table, n_buckets: int = N_BUCKETS) -> pa.Table:
    """Vectorized statement key: blake2b-128 over all term columns.

    Also emits the int shuffle ``bucket`` derived from the digest's first
    bytes (no second hashing pass).
    """
    cols = []
    for c in STMT_COLS:
        if c in batch.column_names:
            col = batch.column(c)
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            cols.append(pc.coalesce(col, pa.scalar(_NULL)))
    joined = pc.binary_join_element_wise(*cols, _SEP)
    keys = []
    buckets = []
    for v in joined.to_pylist():
        d = hashlib.blake2b(v.encode("utf-8", "surrogatepass"), digest_size=16).digest()
        keys.append(d.hex())
        buckets.append(int.from_bytes(d[:4], "big") % n_buckets)
    for c in ("tkey", "bucket"):
        if c in batch.column_names:
            batch = batch.drop_columns([c])
    batch = batch.append_column("tkey", pa.array(keys, pa.string()))
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


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
            "tkey": batch.column("tkey"),
            "packed": packed,
        }
    )


def _min_packed_per_key(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["bucket", "tkey"]).aggregate([("packed", "min")])
    return g.select(["bucket", "tkey", "packed_min"]).rename_columns(
        ["bucket", "tkey", "packed"]
    )


def local_prededup(batch: pa.Table) -> pa.Table:
    """Combiner: keep the min-packed row per tkey within this batch."""
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


#: pre-shuffle coalesce: Ray's sort shuffle cost grows superlinearly with
#: input block count (K maps × K merges object exchanges); measured at
#: sf0.1/32cpu: 64 blocks → 17.8s, 16 blocks → 3.5s.  The combiner already
#: shrank the data, so fewer/larger blocks lose no parallelism that matters.
SHUFFLE_COALESCE_BLOCKS = 16


def dedup_exact(ds, n_buckets: int = N_BUCKETS,
                coalesce_blocks: int = SHUFFLE_COALESCE_BLOCKS):
    """Dataset-level exact dedup; deterministic representative per key.

    add_tkey+pack (map_batches) → local combine → coalesce → bucket groupby
    (int-key shuffle) with vectorized per-bucket Arrow dedup → unpack.
    """
    packed = (
        ds.map_batches(lambda b: add_tkey(b, n_buckets), batch_format="pyarrow")
        .map_batches(pack_rows, batch_format="pyarrow")
        .map_batches(local_prededup, batch_format="pyarrow")
    )
    if coalesce_blocks:
        packed = packed.repartition(coalesce_blocks)
    deduped = packed.groupby("bucket").map_groups(
        _min_packed_per_key, batch_format="pyarrow"
    )
    return deduped.map_batches(unpack_rows, batch_format="pyarrow")
