"""Property-based whole-codec tests: random statement streams through the
fast encode and fast decode paths must agree with the general (reference-
pinned) paths, across random lookup presets and frame sizes.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pyjelly_ray import terms as T
from pyjelly_ray.jelly import LookupPreset, StreamOptions, decode_flat, encode_flat
from pyjelly_ray.jelly.decode_fast import decode_table
from pyjelly_ray.jelly.encode_fast import encode_table
from pyjelly_ray.schema import TRIPLE_SCHEMA
from pyjelly_ray.sinks.jelly_sink import rows_to_terms
from pyjelly_ray.sources.jelly_source import statements_to_table

EX = "http://e/"
_DTS = [None, "http://e/dt1", "http://www.w3.org/2001/XMLSchema#string"]

_iri = st.builds(lambda a, b: T.iri(f"{EX}{a}/{b}"), st.sampled_from("abcd"), st.sampled_from("xyzw"))
_bare_iri = st.builds(lambda a: T.iri(f"urn:{a}"), st.sampled_from("mnpq"))
_bnode = st.builds(lambda a: T.bnode(f"b{a}"), st.sampled_from("0123"))
_lit = st.builds(
    lambda lex, lang, dt: T.literal(lex, lang=lang if dt is None else None, datatype=dt),
    st.sampled_from(["", "v", "w w", "übér"]),
    st.sampled_from([None, "en", "de-AT"]),
    st.sampled_from(_DTS),
)
_subject = st.one_of(_iri, _bare_iri, _bnode)
_object = st.one_of(_iri, _bare_iri, _bnode, _lit)
_triple = st.tuples(_subject, _iri, _object)

_preset = st.sampled_from(
    [LookupPreset(), LookupPreset.small(), LookupPreset.tiny(), LookupPreset.no_prefixes()]
)


def _to_table(stmts) -> pa.Table:
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in stmts:
        cols["s_kind"].append(s[0])
        cols["s_value"].append(s[1])
        cols["p_kind"].append(p[0])
        cols["p_value"].append(p[1])
        cols["o_kind"].append(o[0])
        if o[0] == T.KIND_LITERAL:
            cols["o_value"].append(None)
            cols["o_lex"].append(o[1])
            cols["o_lang"].append(o[2])
            cols["o_dt"].append(o[3])
        else:
            cols["o_value"].append(o[1])
            cols["o_lex"].append(None)
            cols["o_lang"].append(None)
            cols["o_dt"].append(None)
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)


@given(
    st.lists(_triple, min_size=1, max_size=120),
    _preset,
    st.sampled_from([1, 3, 17, 250]),
)
@settings(max_examples=120, deadline=None)
def test_fast_encode_and_decode_agree_with_general(stmts, preset, frame_size):
    # duplicate runs exercise repeated-term suppression
    stmts = stmts + stmts[: len(stmts) // 2]
    opts = StreamOptions(lookup_preset=preset, frame_size=frame_size)
    table = _to_table(stmts)

    slow = b"".join(encode_flat(rows_to_terms(table), opts))
    fast_chunks = encode_table(table, opts)
    assert fast_chunks is not None
    fast = b"".join(fast_chunks)
    assert fast == slow  # byte parity of the columnar encoder

    general = statements_to_table(decode_flat(fast))
    fast_decoded = decode_table(fast)
    assert fast_decoded is not None
    assert fast_decoded.equals(general)  # table parity of the columnar decoder


_graph = st.one_of(
    _iri, _bnode, st.just(T.DEFAULT_GRAPH)
)
_quad = st.tuples(_subject, _iri, _object, _graph)


def _to_quad_table(stmts) -> pa.Table:
    t = _to_table([(s, p, o) for s, p, o, _ in stmts])
    gk, gv = [], []
    for _, _, _, g in stmts:
        gk.append(g[0])
        gv.append(g[1])
    t = t.append_column("g_kind", pa.array(gk, TRIPLE_SCHEMA.field("s_kind").type))
    return t.append_column("g_value", pa.array(gv, pa.string()))


@given(
    st.lists(_quad, min_size=1, max_size=120),
    _preset,
    st.sampled_from([1, 3, 17, 250]),
)
@settings(max_examples=80, deadline=None)
def test_fast_quads_encode_decode_agree_with_general(stmts, preset, frame_size):
    """Same whole-codec property for physical QUADS (graph-slot repeats,
    default-graph term, bnode graph names) — runs through the compiled
    folds when available."""
    from pyjelly_ray.jelly.options import LOGICAL_FLAT_QUADS, PHYSICAL_QUADS

    stmts = stmts + stmts[: len(stmts) // 2]
    opts = StreamOptions(
        lookup_preset=preset,
        frame_size=frame_size,
        physical_type=PHYSICAL_QUADS,
        logical_type=LOGICAL_FLAT_QUADS,
    )
    table = _to_quad_table(stmts)

    slow = b"".join(encode_flat(rows_to_terms(table), opts))
    fast_chunks = encode_table(table, opts)
    assert fast_chunks is not None
    fast = b"".join(fast_chunks)
    assert fast == slow

    general = statements_to_table(decode_flat(fast))
    fast_decoded = decode_table(fast)
    assert fast_decoded is not None
    assert fast_decoded.equals(general)


@given(
    st.lists(st.tuples(_subject, _iri, _object, _graph), min_size=1, max_size=100),
    _preset,
    st.sampled_from([1, 3, 17, 250]),
)
@settings(max_examples=60, deadline=None)
def test_fast_graphs_encode_decode_agree_with_general(stmts, preset, frame_size):
    """Whole-codec property for physical GRAPHS: marker emission (byte
    parity vs the general encoder) and flattened decode parity — through
    the compiled folds when available."""
    from pyjelly_ray.jelly.options import LOGICAL_FLAT_QUADS, PHYSICAL_GRAPHS

    stmts = stmts + stmts[: len(stmts) // 2]
    opts = StreamOptions(
        lookup_preset=preset,
        frame_size=frame_size,
        physical_type=PHYSICAL_GRAPHS,
        logical_type=LOGICAL_FLAT_QUADS,
    )
    table = _to_quad_table(stmts)

    slow = b"".join(encode_flat(rows_to_terms(table), opts))
    fast_chunks = encode_table(table, opts)
    assert fast_chunks is not None
    fast = b"".join(fast_chunks)
    assert fast == slow

    general = statements_to_table(decode_flat(fast))
    fast_decoded = decode_table(fast)
    assert fast_decoded is not None
    assert fast_decoded.equals(general)
