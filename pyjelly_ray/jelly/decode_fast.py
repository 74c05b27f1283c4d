"""Columnar fast-path Jelly decoder: delimited frames → flattened Arrow table.

Counterpart of :mod:`encode_fast` (ROADMAP #3, parse side).  Semantics are
identical to ``decode_flat`` + ``statements_to_table`` (pinned by test), but
statement terms are appended straight into per-slot column lists — no
per-row tuple objects, no second pass over the data:

- lookup tables hold Python strings interned once per entry row; repeated
  occurrences append the SAME string object (refcount bump, no copy);
- repeated-term suppression (unset slot = repeat previous) is a plain
  "append previous value again".

Covers the common shapes: physical TRIPLES, QUADS and GRAPHS (flattened
to quads like ``decode_flat``), flat, no RDF-star or generalized terms.
Returns ``None`` for anything else (caller falls back to the general
decoder) — mirroring the fast encoder's contract.
"""

from __future__ import annotations

import pyarrow as pa

from ..terms import KIND_BNODE, KIND_DEFAULT, KIND_IRI, KIND_LITERAL
from .decode import (
    _ROW_DATATYPE,
    _ROW_GRAPH_END,
    _ROW_GRAPH_START,
    _ROW_NAME,
    _ROW_NAMESPACE,
    _ROW_OPTIONS,
    _ROW_PREFIX,
    _ROW_QUAD,
    _ROW_TRIPLE,
    _parse_entry,
    parse_options,
)
from .lookup import DecoderLookup
from .options import (
    PHYSICAL_GRAPHS,
    PHYSICAL_QUADS,
    PHYSICAL_TRIPLES,
    JellyConformanceError,
)
from .wire import read_varint


def decode_table(data: bytes) -> pa.Table | None:
    """Decode one Jelly byte buffer into the flattened triple-statement table.

    Returns ``None`` when the stream needs the general path (RDF-star term
    encountered, generalized statements incl. literal graph names).
    """
    options, spans = parse_options(data)
    if options.physical_type not in (
        PHYSICAL_TRIPLES,
        PHYSICAL_QUADS,
        PHYSICAL_GRAPHS,
    ):
        return None
    is_quads = options.physical_type == PHYSICAL_QUADS
    is_graphs = options.physical_type == PHYSICAL_GRAPHS
    stmt_row = _ROW_QUAD if is_quads else _ROW_TRIPLE
    emit_g = is_quads or is_graphs  # GRAPHS flattens to quads (decode_flat)
    cur_g: tuple[int, str | None] | None = None  # GRAPHS enclosing marker

    lp0 = options.lookup_preset
    # compiled fold (cfold_dec.py): same rows, same table; any error code
    # or unsupported shape falls through to the Python fold below, which
    # raises the proper conformance errors
    from . import cfold_dec

    if cfold_dec.LIB is not None:
        out = cfold_dec.decode_fold(
            data,
            spans,
            0 if not (is_quads or is_graphs) else (1 if is_quads else 2),
            max_names=lp0.max_names,
            max_prefixes=lp0.max_prefixes,
            max_datatypes=lp0.max_datatypes,
            emit_g=emit_g,
        )
        if out is not None:
            return out

    lp = options.lookup_preset
    names = DecoderLookup(lp.max_names)
    prefixes = DecoderLookup(lp.max_prefixes)
    datatypes = DecoderLookup(lp.max_datatypes)

    s_kind: list[int] = []
    s_value: list[str] = []
    p_value: list[str] = []  # p is always IRI on this path
    o_kind: list[int] = []
    o_value: list[str | None] = []
    o_lex: list[str | None] = []
    o_lang: list[str | None] = []
    o_dt: list[str | None] = []
    g_kind: list[int] = []
    g_value: list[str | None] = []

    # previous term per slot, as pre-flattened column values
    prev_s: tuple[int, str] | None = None
    prev_p: str | None = None
    prev_o: tuple[int, str | None, str | None, str | None, str | None] | None = None
    prev_g: tuple[int, str | None] | None = None

    def decode_iri(start: int, end: int) -> str:
        prefix_id = name_id = 0
        pos = start
        while pos < end:
            key = data[pos]
            pos += 1
            v, pos = read_varint(data, pos)
            if key == 0x08:
                prefix_id = v
            elif key == 0x10:
                name_id = v
        name = names.name_ref(name_id)
        prefix = prefixes.prefix_ref(prefix_id)
        # plain concat beats memoization here (measured): short-string `+`
        # is cheaper than tuple-hash + dict probe per occurrence
        return (prefix + name) if prefix else name

    def decode_literal(start: int, end: int) -> tuple[str, str | None, str | None]:
        lex = ""
        lang = None
        dt_id = None
        pos = start
        while pos < end:
            key = data[pos]
            pos += 1
            if key == 0x0A:  # lex
                ln, pos = read_varint(data, pos)
                lex = data[pos : pos + ln].decode("utf-8")
                pos += ln
            elif key == 0x12:  # langtag
                ln, pos = read_varint(data, pos)
                lang = data[pos : pos + ln].decode("utf-8")
                pos += ln
                dt_id = None
            elif key == 0x18:  # datatype id (varint)
                dt_id, pos = read_varint(data, pos)
                lang = None
            else:  # unknown field: skip by wire type
                if key & 7 == 2:
                    ln, pos = read_varint(data, pos)
                    pos += ln
                else:
                    _, pos = read_varint(data, pos)
        datatype = (
            datatypes.datatype_ref(dt_id)
            if lang is None and dt_id is not None and datatypes.max_size
            else None
        )
        return lex, lang, datatype

    for fs, fe in spans:
        pos = fs
        while pos < fe:
            key = data[pos]
            if key < 0x80:
                pos += 1
            else:
                key, pos = read_varint(data, pos)
            if key != 0x0A:  # not a rows field (e.g. metadata): skip
                wtype = key & 7
                if wtype == 2:
                    ln, pos = read_varint(data, pos)
                    pos += ln
                elif wtype == 0:
                    _, pos = read_varint(data, pos)
                else:
                    raise JellyConformanceError(f"unexpected frame field {key >> 3}")
                continue
            row_len, pos = read_varint(data, pos)
            row_end = pos + row_len
            if row_len == 0:
                continue
            rkey = data[pos]
            if rkey < 0x80:
                rpos = pos + 1
            else:
                rkey, rpos = read_varint(data, pos)
            rfield = rkey >> 3
            body_len, rpos = read_varint(data, rpos)
            s, e = rpos, rpos + body_len
            pos = row_end
            if rfield == stmt_row:
                # statement fields: slot = (field-1)//4, kind = (field-1)%4
                sp = s
                while sp < e:
                    fkey = data[sp]
                    if fkey < 0x80:
                        sp += 1
                    else:
                        fkey, sp = read_varint(data, sp)
                    ln, sp = read_varint(data, sp)
                    field = fkey >> 3
                    vs, ve = sp, sp + ln
                    sp += ln
                    if field == 1:  # s iri
                        prev_s = (KIND_IRI, decode_iri(vs, ve))
                    elif field == 2:  # s bnode
                        prev_s = (KIND_BNODE, data[vs:ve].decode("utf-8"))
                    elif field == 5:  # p iri
                        prev_p = decode_iri(vs, ve)
                    elif field == 6:  # p bnode — not on fast path
                        return None
                    elif field == 9:  # o iri
                        prev_o = (KIND_IRI, decode_iri(vs, ve), None, None, None)
                    elif field == 10:  # o bnode
                        prev_o = (KIND_BNODE, data[vs:ve].decode("utf-8"), None, None, None)
                    elif field == 11:  # o literal
                        lex, lang, dt = decode_literal(vs, ve)
                        prev_o = (KIND_LITERAL, None, lex, lang, dt)
                    elif field == 13 and is_quads:  # g iri
                        prev_g = (KIND_IRI, decode_iri(vs, ve))
                    elif field == 14 and is_quads:  # g bnode
                        prev_g = (KIND_BNODE, data[vs:ve].decode("utf-8"))
                    elif field == 15 and is_quads:  # g default graph
                        prev_g = (KIND_DEFAULT, None)
                    else:  # generalized literal s/p/g (3/7/16), RDF-star (4/8/12)
                        return None
                if prev_s is None or prev_p is None or prev_o is None:
                    raise JellyConformanceError("missing repeated term")
                if is_quads:
                    if prev_g is None:
                        raise JellyConformanceError("missing repeated graph term")
                    g_kind.append(prev_g[0])
                    g_value.append(prev_g[1])
                elif is_graphs:
                    if cur_g is None:
                        raise JellyConformanceError("triple outside graph bounds")
                    g_kind.append(cur_g[0])
                    g_value.append(cur_g[1])
                s_kind.append(prev_s[0])
                s_value.append(prev_s[1])
                p_value.append(prev_p)
                o_kind.append(prev_o[0])
                o_value.append(prev_o[1])
                o_lex.append(prev_o[2])
                o_lang.append(prev_o[3])
                o_dt.append(prev_o[4])
            elif rfield == _ROW_NAME:
                idx, val = _parse_entry(data, s, e)
                names.assign(idx, val)
            elif rfield == _ROW_PREFIX:
                idx, val = _parse_entry(data, s, e)
                prefixes.assign(idx, val)
            elif rfield == _ROW_DATATYPE:
                idx, val = _parse_entry(data, s, e)
                datatypes.assign(idx, val)
            elif rfield == _ROW_GRAPH_START and is_graphs:
                # RdfGraphStart: fields 1-4 = iri/bnode/default/literal;
                # the iri decode mutates lookup delta state — always run it
                sp = s
                cur_g = (KIND_DEFAULT, None)  # empty body = default graph
                while sp < e:
                    fkey = data[sp]
                    if fkey < 0x80:
                        sp += 1
                    else:
                        fkey, sp = read_varint(data, sp)
                    ln, sp = read_varint(data, sp)
                    field = fkey >> 3
                    if field == 1:
                        cur_g = (KIND_IRI, decode_iri(sp, sp + ln))
                    elif field == 2:
                        cur_g = (KIND_BNODE, data[sp : sp + ln].decode("utf-8"))
                    elif field == 3:
                        cur_g = (KIND_DEFAULT, None)
                    else:  # literal graph name: generalized → general path
                        return None
                    break  # general decoder takes the FIRST field — mirror it
            elif rfield == _ROW_GRAPH_END and is_graphs:
                cur_g = None
            elif rfield == _ROW_OPTIONS:
                pass
            elif rfield == _ROW_NAMESPACE:
                # the declaration embeds an RdfIri whose prefix/name refs
                # mutate delta state — decode and discard to stay in sync
                sp = s
                while sp < e:
                    fkey = data[sp]
                    if fkey < 0x80:
                        sp += 1
                    else:
                        fkey, sp = read_varint(data, sp)
                    ln, sp = read_varint(data, sp)
                    if fkey >> 3 == 2:
                        decode_iri(sp, sp + ln)
                    sp += ln
            else:
                return None  # quad/graph rows: fall back

    n = len(s_kind)
    cols = {
        "s_kind": pa.array(s_kind, pa.uint8()),
        "s_value": pa.array(s_value, pa.string()),
        "p_kind": pa.array([KIND_IRI] * n, pa.uint8()),
        "p_value": pa.array(p_value, pa.string()),
        "o_kind": pa.array(o_kind, pa.uint8()),
        "o_value": pa.array(o_value, pa.string()),
        "o_lex": pa.array(o_lex, pa.string()),
        "o_lang": pa.array(o_lang, pa.string()),
        "o_dt": pa.array(o_dt, pa.string()),
    }
    if emit_g:
        cols["g_kind"] = pa.array(g_kind, pa.uint8())
        cols["g_value"] = pa.array(g_value, pa.string())
    return pa.table(cols)


__all__ = ["decode_table"]
