"""Jelly input: .jelly files → Dataset of flattened statement rows.

Ray mapping (SURVEY.md §2.1 ``frame_iterator`` row): files are read with
``ray.data.read_binary_files`` (parallel across files), then each file is
decoded *sequentially* inside ``flat_map``-style ``map_batches`` — decoder
state (lookups, repeated terms) is per-stream and cannot be split, which is
exactly the format's parallelism unit (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..jelly.decode import decode_flat
from ..terms import KIND_DEFAULT, KIND_LITERAL


def statements_to_table(statements, *, quads: bool | None = None) -> pa.Table:
    """Flatten term-tuple statements into the columnar statement schema."""
    s_kind, s_value = [], []
    p_kind, p_value = [], []
    o_kind, o_value, o_lex, o_lang, o_dt = [], [], [], [], []
    g_kind, g_value = [], []
    saw_quad = False
    for stmt in statements:
        s, p, o = stmt[0], stmt[1], stmt[2]
        s_kind.append(s[0])
        s_value.append(s[1])
        p_kind.append(p[0])
        p_value.append(p[1])
        o_kind.append(o[0])
        if o[0] == KIND_LITERAL:
            o_value.append(None)
            o_lex.append(o[1])
            o_lang.append(o[2])
            o_dt.append(o[3])
        else:
            o_value.append(o[1])
            o_lex.append(None)
            o_lang.append(None)
            o_dt.append(None)
        if len(stmt) == 4:
            saw_quad = True
            g = stmt[3]
            g_kind.append(g[0])
            g_value.append(None if g[0] == KIND_DEFAULT else g[1])
        else:
            g_kind.append(None)
            g_value.append(None)
    data = {
        "s_kind": pa.array(s_kind, pa.uint8()),
        "s_value": pa.array(s_value, pa.string()),
        "p_kind": pa.array(p_kind, pa.uint8()),
        "p_value": pa.array(p_value, pa.string()),
        "o_kind": pa.array(o_kind, pa.uint8()),
        "o_value": pa.array(o_value, pa.string()),
        "o_lex": pa.array(o_lex, pa.string()),
        "o_lang": pa.array(o_lang, pa.string()),
        "o_dt": pa.array(o_dt, pa.string()),
    }
    if quads or (quads is None and saw_quad):
        data["g_kind"] = pa.array(g_kind, pa.uint8())
        data["g_value"] = pa.array(g_value, pa.string())
    return pa.table(data)


def decode_files_batch(batch: dict) -> pa.Table:
    """map_batches fn over read_binary_files output: decode each file."""
    tables = []
    for data in batch["bytes"]:
        b = bytes(data)
        if not b:
            continue
        tables.append(statements_to_table(decode_flat(b)))
    if not tables:
        return statements_to_table(())
    return pa.concat_tables(tables, promote_options="default")


def read_jelly(paths, *, concurrency: int | None = None):
    """Read one or many .jelly files/dirs into a statement Dataset."""
    import ray

    files = ray.data.read_binary_files(paths, file_extensions=["jelly"])
    return files.map_batches(
        decode_files_batch,
        batch_format="numpy",
        concurrency=concurrency,
    )
