"""Exact statement dedup (SURVEY.md §2.5) — the pipeline's big shuffle.

Scale-aware design:

1. **Local pre-dedup** inside ``map_batches`` (no shuffle): drops duplicates
   within each batch — the "combiner" that shrinks the all-to-all exchange.
2. **Global dedup as an aggregation, not map_groups**: the representative
   row (min ``(repo, path, seq)``) is chosen with ``groupby(tkey).min(packed)``
   where ``packed`` is the whole row packed into one sortable string whose
   prefix is the order key.  A vectorized per-block aggregate beats a
   per-group Python callback by orders of magnitude when there are millions
   of distinct keys, and the result is deterministic regardless of execution
   order.

Skew note: dedup keys are content hashes — uniformly distributed, no
salting needed here.  (Hot *repos* skew the writer partitioning instead;
handled in sinks/jelly_sink.py via repo-hash buckets.)

Constraint: packed columns must not contain 0x1f/0x00 control chars (RDF
IRIs/identifiers never do; literals from the code corpus don't either).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

STMT_COLS = ("s_kind", "s_value", "p_kind", "p_value", "o_kind", "o_value", "o_lex", "o_lang", "o_dt")
_LINEAGE = ("repo", "path", "seq", "content_sha256")
_SEP = "\x1f"
_NULL = "\x00"


def add_tkey(batch: pa.Table) -> pa.Table:
    """Vectorized statement key: blake2b-128 over all term columns."""
    cols = []
    for c in STMT_COLS:
        if c in batch.column_names:
            col = batch.column(c)
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            cols.append(pc.coalesce(col, pa.scalar(_NULL)))
    joined = pc.binary_join_element_wise(*cols, _SEP)
    keys = [
        hashlib.blake2b(v.encode("utf-8", "surrogatepass"), digest_size=16).hexdigest()
        for v in joined.to_pylist()
    ]
    if "tkey" in batch.column_names:
        batch = batch.drop_columns(["tkey"])
    return batch.append_column("tkey", pa.array(keys, pa.string()))


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
    return pa.table({"tkey": batch.column("tkey"), "packed": packed})


def local_prededup(batch: pa.Table) -> pa.Table:
    """Combiner: keep the min-packed row per tkey within this batch."""
    if batch.num_rows == 0:
        return batch
    grouped = batch.group_by(["tkey"]).aggregate([("packed", "min")])
    return grouped.select(["tkey", "packed_min"]).rename_columns(["tkey", "packed"])


def unpack_rows(batch: pa.Table) -> pa.Table:
    """Inverse of pack_rows → full statement + lineage schema."""
    parts = pc.split_pattern(batch.column("packed"), _SEP)
    names = [c for c in _LINEAGE] + [c for c in STMT_COLS]
    out: dict[str, pa.ChunkedArray] = {}
    for i, name in enumerate(names):
        col = pc.list_element(parts, i)
        col = pc.if_else(pc.equal(col, _NULL), pa.scalar(None, pa.string()), col)
        if name == "seq":
            col = pc.cast(col, pa.int32())
        elif name.endswith("_kind"):
            col = pc.cast(col, pa.uint8())
        out[name] = col
    return pa.table(out)


def dedup_exact(ds):
    """Dataset-level exact dedup; deterministic representative per key.

    Pipeline: add_tkey+pack (map_batches) → local combine → global
    groupby-min (the one shuffle) → unpack (map_batches).
    """
    packed = (
        ds.map_batches(add_tkey, batch_format="pyarrow")
        .map_batches(pack_rows, batch_format="pyarrow")
        .map_batches(local_prededup, batch_format="pyarrow")
    )
    agg = packed.groupby("tkey").min("packed")
    agg = agg.rename_columns({"min(packed)": "packed"})
    return agg.map_batches(unpack_rows, batch_format="pyarrow")
