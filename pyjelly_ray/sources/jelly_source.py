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
    """Flatten term-tuple statements into the columnar statement schema.

    Generalized statements (literal subjects/predicates/graphs — protocol
    flag ``generalized_statements``, reference options row field 3) get
    per-slot ``{s,p,g}_lex/_lang/_dt`` columns, added only when such terms
    actually occur so the common triples shape stays 9 columns.
    """
    s_kind, s_value = [], []
    p_kind, p_value = [], []
    o_kind, o_value, o_lex, o_lang, o_dt = [], [], [], [], []
    g_kind, g_value = [], []
    s_lit, p_lit, g_lit = [], [], []  # (lex, lang, dt) per row, mostly None
    saw_quad = False
    saw_gen = False
    for stmt in statements:
        s, p, o = stmt[0], stmt[1], stmt[2]
        s_kind.append(s[0])
        if s[0] == KIND_LITERAL:
            saw_gen = True
            s_value.append(None)
            s_lit.append((s[1], s[2], s[3]))
        else:
            s_value.append(s[1])
            s_lit.append(None)
        p_kind.append(p[0])
        if p[0] == KIND_LITERAL:
            saw_gen = True
            p_value.append(None)
            p_lit.append((p[1], p[2], p[3]))
        else:
            p_value.append(p[1])
            p_lit.append(None)
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
            if g[0] == KIND_LITERAL:
                saw_gen = True
                g_value.append(None)
                g_lit.append((g[1], g[2], g[3]))
            else:
                g_value.append(None if g[0] == KIND_DEFAULT else g[1])
                g_lit.append(None)
        else:
            g_kind.append(None)
            g_value.append(None)
            g_lit.append(None)
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
    want_quads = quads or (quads is None and saw_quad)
    if want_quads:
        data["g_kind"] = pa.array(g_kind, pa.uint8())
        data["g_value"] = pa.array(g_value, pa.string())
    if saw_gen:
        for slot, lits in (("s", s_lit), ("p", p_lit)) + (
            (("g", g_lit),) if want_quads else ()
        ):
            data[f"{slot}_lex"] = pa.array(
                [t[0] if t else None for t in lits], pa.string()
            )
            data[f"{slot}_lang"] = pa.array(
                [t[1] if t else None for t in lits], pa.string()
            )
            data[f"{slot}_dt"] = pa.array(
                [t[2] if t else None for t in lits], pa.string()
            )
    return pa.table(data)


def decode_files_batch(batch: dict) -> pa.Table:
    """map_batches fn over read_binary_files output: decode each file.

    Tries the columnar fast path (jelly/decode_fast.py — no per-row tuple
    objects; covers flat TRIPLES and QUADS) and falls back to the general
    decoder for graphs/star/generalized streams.
    """
    from ..jelly.decode_fast import decode_table

    tables = []
    for data in batch["bytes"]:
        b = bytes(data)
        if not b:
            continue
        t = decode_table(b)
        tables.append(t if t is not None else statements_to_table(decode_flat(b)))
    if not tables:
        # typed empty (not schema-less): keeps every output block
        # schema-compatible so downstream operators and Ray's executor
        # never see a 0-column block
        from ..schema import TRIPLE_SCHEMA

        return TRIPLE_SCHEMA.empty_table()
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
