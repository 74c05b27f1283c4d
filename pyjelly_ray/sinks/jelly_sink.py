"""Jelly output: sharded delimited streams + lineage manifests + resume.

Two writers (SURVEY.md §2.1 "grouped/flat_stream_to_file" → Ray mapping):

- :func:`write_kg_shards` — the KG pipeline sink.  Statements are bucketed
  by ``hash(repo) % n_shards`` (graph locality; the hot repo is split
  further by path hash — salting), each bucket is written by ONE task with a
  fresh :class:`StreamEncoder` after an in-group sort by ``(repo, path,
  seq)`` so shard bytes are deterministic regardless of execution order
  (SURVEY.md §4.2 'ordering').  Each shard writes ``.tmp`` → fsync → atomic
  rename, then a manifest JSON (input fingerprint, counts, sha256 roll-up).
  On resume, shards whose manifest matches are skipped without re-encoding.

- :class:`JellyDatasink` — generic ``ds.write_datasink(...)`` sink for any
  flattened-statement Dataset: one independent delimited stream per write
  task (the format's unit of parallelism).
"""

from __future__ import annotations

import json
import os
from functools import reduce

import pyarrow as pa

from ..jelly.encode import StreamEncoder
from ..jelly.options import (
    LOGICAL_FLAT_QUADS,
    PHYSICAL_QUADS,
    StreamOptions,
)
from ..terms import KIND_BNODE, KIND_DEFAULT, KIND_IRI, KIND_LITERAL


def rows_to_terms(batch: pa.Table):
    """Yield statement term-tuples from a flattened statement table."""
    names = batch.column_names
    has_g = "g_kind" in names
    cols = [
        batch.column("s_kind").to_pylist(),
        batch.column("s_value").to_pylist(),
        batch.column("p_kind").to_pylist(),
        batch.column("p_value").to_pylist(),
        batch.column("o_kind").to_pylist(),
        batch.column("o_value").to_pylist(),
        batch.column("o_lex").to_pylist() if "o_lex" in names else [None] * batch.num_rows,
        batch.column("o_lang").to_pylist() if "o_lang" in names else [None] * batch.num_rows,
        batch.column("o_dt").to_pylist() if "o_dt" in names else [None] * batch.num_rows,
    ]
    if has_g:
        g_kinds = batch.column("g_kind").to_pylist()
        g_vals = batch.column("g_value").to_pylist()
    for i in range(batch.num_rows):
        s = (cols[0][i], cols[1][i], None, None)
        p = (cols[2][i], cols[3][i], None, None)
        o_kind = cols[4][i]
        if o_kind == KIND_LITERAL:
            o = (KIND_LITERAL, cols[6][i] or "", cols[7][i], cols[8][i])
        else:
            o = (o_kind, cols[5][i], None, None)
        if has_g:
            gk = g_kinds[i]
            g = (KIND_DEFAULT, None, None, None) if gk == KIND_DEFAULT else (gk, g_vals[i], None, None)
            yield (s, p, o, g)
        else:
            yield (s, p, o)


def _write_stream(path: str, statements, options: StreamOptions) -> tuple[int, int]:
    """Encode statements into one delimited stream at ``path`` (tmp+rename)."""
    tmp = path + ".tmp"
    n = 0
    total = 0
    enc = StreamEncoder(options)
    quads = options.physical_type in (PHYSICAL_QUADS,)
    with open(tmp, "wb") as f:
        for stmt in statements:
            out = (
                enc.quad(stmt[0], stmt[1], stmt[2], stmt[3])
                if quads
                else enc.triple(stmt[0], stmt[1], stmt[2])
            )
            n += 1
            if out:
                total += f.write(out)
        tail = enc.flush()
        if tail:
            total += f.write(tail)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return n, total


def _sha_xor(shas) -> str:
    """Order-insensitive roll-up of per-row sha256 hex digests."""
    acc = 0
    for s in set(shas):
        if s:
            acc ^= int(s, 16)
    return f"{acc:064x}"


class ShardJellyWriter:
    """``map_groups`` callable: one shard group → one .jelly file + manifest row."""

    def __init__(self, out_dir: str, options: StreamOptions | None = None) -> None:
        self.out_dir = out_dir
        self.options = options or StreamOptions()
        os.makedirs(out_dir, exist_ok=True)
        os.makedirs(os.path.join(out_dir, "manifests"), exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        shard = f"{group.column('shard')[0].as_py():05d}"
        order = [c for c in ("repo", "path", "seq") if c in group.column_names]
        if order:
            group = group.sort_by([(c, "ascending") for c in order])
        out_path = os.path.join(self.out_dir, f"part-{shard}.jelly")
        manifest_path = os.path.join(self.out_dir, "manifests", f"part-{shard}.json")

        shas = (
            group.column("content_sha256").to_pylist()
            if "content_sha256" in group.column_names
            else []
        )
        fingerprint = _sha_xor(shas)

        # resume: skip shards already written for identical input
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prev = json.load(f)
            if (
                prev.get("sha256_xor") == fingerprint
                and prev.get("n_statements") == group.num_rows
                and os.path.exists(out_path)
            ):
                prev["status"] = "skipped"
                return pa.Table.from_pylist([prev])

        n, total = _write_stream(out_path, rows_to_terms(group), self.options)
        manifest = {
            "shard": shard,
            "path": out_path,
            "n_statements": n,
            "n_bytes": total,
            "n_files": len(set(zip(group.column("repo").to_pylist(), group.column("path").to_pylist())))
            if "repo" in group.column_names
            else 0,
            "sha256_xor": fingerprint,
            "status": "written",
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        return pa.Table.from_pylist([manifest])


def add_shard_column(n_shards: int, hot_split: int = 8):
    """Returns a map_batches fn assigning ``shard = hash(repo) % n_shards``.

    Skew guard: repos whose bucket would exceed its fair share get salted by
    path hash across ``hot_split`` sub-buckets (appended beyond n_shards) —
    deterministic, no coordination needed.
    """
    import hashlib as _hl

    def _assign(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        shards = []
        for r, p in zip(repos, paths):
            h = int.from_bytes(_hl.blake2b(r.encode(), digest_size=4).digest(), "big")
            if h % 4 == 0 and hot_split > 1:
                # statically split every 4th repo-bucket by path (cheap
                # stand-in for a frequency-based hot detector; keeps bytes
                # deterministic without a global count pass)
                ph = int.from_bytes(_hl.blake2b(p.encode(), digest_size=4).digest(), "big")
                shards.append(n_shards + (h + ph) % (n_shards * (hot_split - 1)))
            else:
                shards.append(h % n_shards)
        if "shard" in batch.column_names:
            batch = batch.drop_columns(["shard"])
        return batch.append_column("shard", pa.array(shards, pa.int32()))

    return _assign


def write_kg_shards(ds, out_dir: str, n_shards: int = 16, options: StreamOptions | None = None):
    """KG sink: bucket by repo hash → per-shard sorted sequential encode.

    Returns the manifest Dataset (one row per shard).
    """
    ds = ds.map_batches(add_shard_column(n_shards), batch_format="pyarrow")
    writer = ShardJellyWriter(out_dir, options)

    def write_shard(group: pa.Table) -> pa.Table:
        return writer(group)

    return ds.groupby("shard").map_groups(write_shard, batch_format="pyarrow")


try:  # Datasink requires ray at import; keep module importable without it
    from ray.data import Datasink
    from ray.data._internal.execution.interfaces import TaskContext
    from ray.data.block import Block, BlockAccessor

    class JellyDatasink(Datasink):
        """Generic sink: each write task emits one independent .jelly stream."""

        def __init__(self, path: str, options: StreamOptions | None = None) -> None:
            self.path = path
            self.options = options or StreamOptions()
            self._quads = self.options.physical_type == PHYSICAL_QUADS

        def on_write_start(self) -> None:
            os.makedirs(self.path, exist_ok=True)

        def write(self, blocks, ctx: "TaskContext"):
            idx = ctx.task_idx
            out = os.path.join(self.path, f"part-{idx:06d}.jelly")

            def statements():
                for block in blocks:
                    table = BlockAccessor.for_block(block).to_arrow()
                    yield from rows_to_terms(table)

            _write_stream(out, statements(), self.options)
            return "ok"

    HAVE_RAY = True
except ImportError:  # pragma: no cover
    HAVE_RAY = False


def flat_quads_options(**kw) -> StreamOptions:
    return StreamOptions(
        physical_type=PHYSICAL_QUADS, logical_type=LOGICAL_FLAT_QUADS, **kw
    )
