"""Cross-implementation conformance: our codec ⟷ reference pyjelly.

Mirrors the reference's e2e strategy (preset × frame-size grid, set/sequence
equality after round-trip — /root/reference/tests/e2e_tests/test_e2e.py:37-43)
plus BYTE equality of our writer vs pyjelly's writer on identical streams.
"""

from __future__ import annotations

import io

import pytest

from pyjelly_ray import terms as T
from pyjelly_ray.jelly import (
    LOGICAL_FLAT_QUADS,
    PHYSICAL_QUADS,
    LookupPreset,
    StreamOptions,
    decode_flat,
    encode_flat,
)

EX = "http://example.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def sample_triples(n=40):
    stmts = []
    for i in range(n):
        s = T.iri(f"{EX}subj/{i % 7}")
        p = T.iri(f"{EX}pred#p{i % 3}")
        if i % 4 == 0:
            o = T.literal(f"value {i}")
        elif i % 4 == 1:
            o = T.literal(f"{i}", datatype=XSD_INT)
        elif i % 4 == 2:
            o = T.literal(f"hola {i}", lang="es")
        else:
            o = T.bnode(f"b{i % 5}")
        stmts.append((s, p, o))
    # repeated terms runs
    rep = (T.iri(EX + "s"), T.iri(EX + "p"), T.literal("x"))
    stmts.extend([rep] * 5)
    # xsd:string literal must suppress its datatype on the wire
    stmts.append((T.iri(EX + "s"), T.iri(EX + "p"), T.literal("plain", datatype=XSD_STRING)))
    # unsplittable IRI (no # or /)
    stmts.append((T.iri("urn:uuid:abc"), T.iri(EX + "p"), T.iri("tag:x")))
    return stmts


def normalize(stmts):
    """xsd:string datatypes are suppressed on the wire → parse as plain."""

    def norm_term(t):
        if t[0] == T.KIND_LITERAL and t[3] == XSD_STRING:
            return (t[0], t[1], t[2], None)
        return t

    return [tuple(norm_term(t) for t in s) for s in stmts]


def sample_quads(n=30):
    quads = []
    graphs = [T.iri(EX + "g1"), T.bnode("gb"), T.DEFAULT_GRAPH]
    for i, (s, p, o) in enumerate(sample_triples(n)):
        quads.append((s, p, o, graphs[i % 3]))
    return quads


PRESETS = {
    "default": LookupPreset(),
    "small": LookupPreset.small(),
    "tiny": LookupPreset.tiny(),
    "no_prefix": LookupPreset.no_prefixes(),
}
FRAME_SIZES = [1, 4, 200, 10000]


def _pyjelly_serialize(statements, preset, frame_size, physical):
    """Serialize via reference pyjelly; returns bytes."""
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.serialize import flat_stream_to_file
    from pyjelly.options import LookupPreset as RefPreset
    from pyjelly.options import StreamParameters
    from pyjelly.serialize.streams import SerializerOptions
    from pyjelly import jelly as ref_jelly

    from tests.interop import to_generic_statement

    logical = (
        ref_jelly.LOGICAL_STREAM_TYPE_FLAT_TRIPLES
        if physical == "triples"
        else ref_jelly.LOGICAL_STREAM_TYPE_FLAT_QUADS
    )
    opts = SerializerOptions(
        logical_type=logical,
        frame_size=frame_size,
        lookup_preset=RefPreset(
            max_names=preset.max_names,
            max_prefixes=preset.max_prefixes,
            max_datatypes=preset.max_datatypes,
        ),
        params=StreamParameters(generalized_statements=True, rdf_star=True),
    )
    buf = io.BytesIO()
    flat_stream_to_file(
        (to_generic_statement(s) for s in statements), buf, options=opts
    )
    return buf.getvalue()


def _pyjelly_parse(data):
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.generic_sink import GenericStatementSink

    from tests.interop import from_generic_statement

    sink = GenericStatementSink()
    sink.parse(io.BytesIO(data))
    return [from_generic_statement(s) for s in sink.store]


def _our_options(preset, frame_size, physical):
    if physical == "triples":
        return StreamOptions(
            lookup_preset=preset,
            frame_size=frame_size,
            generalized_statements=True,
            rdf_star=True,
        )
    return StreamOptions(
        physical_type=PHYSICAL_QUADS,
        logical_type=LOGICAL_FLAT_QUADS,
        lookup_preset=preset,
        frame_size=frame_size,
        generalized_statements=True,
        rdf_star=True,
    )


@pytest.mark.parametrize("preset_name", list(PRESETS))
@pytest.mark.parametrize("frame_size", FRAME_SIZES)
@pytest.mark.parametrize("physical", ["triples", "quads"])
def test_bytes_match_pyjelly(pyjelly_reference, preset_name, frame_size, physical):
    """Our writer must be byte-identical to pyjelly's on the same stream."""
    preset = PRESETS[preset_name]
    stmts = sample_triples() if physical == "triples" else sample_quads()
    ours = b"".join(encode_flat(stmts, _our_options(preset, frame_size, physical)))
    theirs = _pyjelly_serialize(stmts, preset, frame_size, physical)
    assert ours == theirs


@pytest.mark.parametrize("preset_name", list(PRESETS))
@pytest.mark.parametrize("frame_size", [1, 200])
@pytest.mark.parametrize("physical", ["triples", "quads"])
def test_our_bytes_parse_by_pyjelly(pyjelly_reference, preset_name, frame_size, physical):
    preset = PRESETS[preset_name]
    stmts = sample_triples() if physical == "triples" else sample_quads()
    ours = b"".join(encode_flat(stmts, _our_options(preset, frame_size, physical)))
    parsed = _pyjelly_parse(ours)
    assert parsed == normalize(stmts)


@pytest.mark.parametrize("preset_name", list(PRESETS))
@pytest.mark.parametrize("physical", ["triples", "quads"])
def test_pyjelly_bytes_parse_by_us(pyjelly_reference, preset_name, physical):
    preset = PRESETS[preset_name]
    stmts = sample_triples() if physical == "triples" else sample_quads()
    theirs = _pyjelly_serialize(stmts, preset, 100, physical)
    parsed = list(decode_flat(theirs))
    assert parsed == normalize(stmts)


def test_lookup_eviction_roundtrip(pyjelly_reference):
    """Overflow tiny lookups to force LRU evict-and-reuse-index behavior."""
    stmts = []
    for i in range(300):
        s = T.iri(f"{EX}ns{i % 37}/s{i}")
        p = T.iri(f"{EX}p{i % 23}#x")
        o = T.literal(f"{i}", datatype=f"{EX}dt{i % 50}")
        stmts.append((s, p, o))
    preset = LookupPreset.tiny()
    opts = _our_options(preset, 10, "triples")
    ours = b"".join(encode_flat(stmts, opts))
    theirs = _pyjelly_serialize(stmts, preset, 10, "triples")
    assert ours == theirs
    assert list(decode_flat(ours)) == normalize(stmts)
    assert _pyjelly_parse(ours) == normalize(stmts)


def test_own_roundtrip_quoted_triples():
    """RDF-star quoted triples (generic model only)."""
    q = T.quoted(T.iri(EX + "a"), T.iri(EX + "b"), T.literal("c"))
    stmts = [(q, T.iri(EX + "says"), T.literal("meta")), (T.iri(EX + "s"), T.iri(EX + "p"), q)]
    data = b"".join(encode_flat(stmts, StreamOptions(rdf_star=True)))
    assert list(decode_flat(data)) == stmts


def test_non_delimited_single_frame():
    stmts = sample_triples(10)
    opts = StreamOptions(delimited=False)
    from pyjelly_ray.jelly.encode import StreamEncoder

    enc = StreamEncoder(opts)
    for s, p, o in stmts:
        assert enc.triple(s, p, o) is None
    frame = enc.flush()
    from pyjelly_ray.jelly import delimited_hint

    assert not delimited_hint(frame[:3])
    assert list(decode_flat(frame)) == normalize(stmts)
    assert _pyjelly_parse(frame) == normalize(stmts)


def test_frame_metadata_roundtrip(pyjelly_reference):
    """Frame metadata (map<string,bytes>) encode → pyjelly + our decoder."""
    import sys

    sys.path.insert(0, "/root/reference")
    from google.protobuf.proto import parse_length_prefixed
    from pyjelly.jelly import rdf_pb2 as pb

    from pyjelly_ray.jelly.decode import iter_frames
    from pyjelly_ray.jelly.encode import StreamEncoder

    enc = StreamEncoder(StreamOptions())
    enc.triple(T.iri(EX + "s"), T.iri(EX + "p"), T.literal("x"))
    data = enc.cut_frame(metadata={"k": b"\x01\x02", "n": b"hello"})
    # our grouped reader surfaces it
    frames = list(iter_frames(data))
    assert frames[0][1] == {"k": b"\x01\x02", "n": b"hello"}
    assert ("triple" == frames[0][0][0][0])
    # reference protobuf parses the same map
    import io

    frame = parse_length_prefixed(pb.RdfStreamFrame, io.BytesIO(data))
    assert dict(frame.metadata) == {"k": b"\x01\x02", "n": b"hello"}


def test_frame_metadata_bounded_path(pyjelly_reference):
    """Per-frame metadata on the AUTO-CUT path (metadata_fn), fast ≡ slow.

    Lineage use case: every frame of a shard stream carries its frame seq.
    """
    import io
    import sys

    sys.path.insert(0, "/root/reference")
    from google.protobuf.proto import parse_length_prefixed
    from pyjelly.jelly import rdf_pb2 as pb

    from pyjelly_ray.jelly.encode import StreamEncoder
    from pyjelly_ray.jelly.encode_fast import encode_table
    from pyjelly_ray.sinks.jelly_sink import rows_to_terms

    def md(i: int) -> dict[str, bytes]:
        return {"frame": str(i).encode(), "shard": b"00042"}

    stmts = sample_triples(25)
    opts = StreamOptions(frame_size=10)
    enc = StreamEncoder(opts)
    enc.metadata_fn = md
    out = bytearray()
    for s, p, o in stmts:
        chunk = enc.triple(s, p, o)
        if chunk:
            out += chunk
    out += enc.flush()
    data = bytes(out)

    # reference protobuf sees the metadata on every frame, in index order
    buf, seen = io.BytesIO(data), []
    while buf.tell() < len(data):
        frame = parse_length_prefixed(pb.RdfStreamFrame, buf)
        seen.append(dict(frame.metadata))
    assert len(seen) >= 2  # frame_size=10 over 25+ rows → multiple frames
    for i, m in enumerate(seen):
        assert m == {"frame": str(i).encode(), "shard": b"00042"}
    # decoded statements unaffected
    assert list(decode_flat(data)) == normalize(stmts)

    # columnar fast path: identical bytes with the same metadata_fn
    table = _stmts_to_table(stmts)
    if table is not None:
        fast = b"".join(encode_table(table, opts, metadata_fn=md))
        slow_from_table = bytearray()
        enc2 = StreamEncoder(opts)
        enc2.metadata_fn = md
        for s, p, o in rows_to_terms(table):
            chunk = enc2.triple(s, p, o)
            if chunk:
                slow_from_table += chunk
        slow_from_table += enc2.flush()
        assert fast == bytes(slow_from_table)


def _stmts_to_table(stmts):
    """Triple tuples → flattened Arrow table (None if shape unsupported)."""
    import pyarrow as pa

    from pyjelly_ray.schema import TRIPLE_SCHEMA
    from pyjelly_ray.terms import KIND_IRI, KIND_LITERAL

    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in stmts:
        if s[0] not in (KIND_IRI, 2) or p[0] != KIND_IRI:
            return None
        cols["s_kind"].append(s[0])
        cols["s_value"].append(s[1])
        cols["p_kind"].append(p[0])
        cols["p_value"].append(p[1])
        cols["o_kind"].append(o[0])
        if o[0] == KIND_LITERAL:
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


def test_grouped_subject_graphs_interop(pyjelly_reference):
    """encode_grouped: one frame per group; reference grouped parse yields
    one container per frame (logical SUBJECT_GRAPHS, physical TRIPLES)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.parse import parse_jelly_grouped

    from pyjelly_ray.jelly import encode_grouped
    from pyjelly_ray.jelly.options import LOGICAL_SUBJECT_GRAPHS

    groups = [
        [(T.iri(f"{EX}s{g}"), T.iri(f"{EX}p{i}"), T.literal(f"v{g}.{i}"))
         for i in range(3 + g)]
        for g in range(4)
    ]
    opts = StreamOptions(logical_type=LOGICAL_SUBJECT_GRAPHS)
    data = b"".join(encode_grouped(iter(map(iter, groups)), opts))

    import io

    sinks = list(parse_jelly_grouped(io.BytesIO(data)))
    assert len(sinks) == 4
    for g, sink in enumerate(sinks):
        got = [(s, p, o) for s, p, o in sink]
        assert len(got) == 3 + g
        assert all(repr(s) == f"IRI({EX}s{g})" for s, _, _ in got)

    # our grouped reader agrees on the framing
    from pyjelly_ray.jelly.decode import iter_frames

    frames = list(iter_frames(data))
    assert [len([e for e in ev if e[0] == "triple"]) for ev, _ in frames] == [3, 4, 5, 6]


def test_grouped_named_graphs_quads_interop(pyjelly_reference):
    """encode_grouped over QUAD groups (logical NAMED_GRAPHS, physical
    QUADS): one dataset container per frame when the reference parses it."""
    import io
    import sys

    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.parse import parse_jelly_grouped

    from pyjelly_ray.jelly import encode_grouped
    from pyjelly_ray.jelly.options import (
        LOGICAL_NAMED_GRAPHS,
        PHYSICAL_QUADS,
    )

    groups = [
        [
            (
                T.iri(f"{EX}s{g}.{i}"),
                T.iri(f"{EX}p{i}"),
                T.literal(f"v{g}.{i}"),
                T.iri(f"{EX}graph{g}"),
            )
            for i in range(2 + g)
        ]
        for g in range(3)
    ]
    opts = StreamOptions(
        physical_type=PHYSICAL_QUADS, logical_type=LOGICAL_NAMED_GRAPHS
    )
    data = b"".join(encode_grouped(iter(map(iter, groups)), opts))

    sinks = list(parse_jelly_grouped(io.BytesIO(data)))
    assert len(sinks) == 3
    for g, sink in enumerate(sinks):
        got = list(sink)
        assert len(got) == 2 + g
        assert all(repr(q.g) == f"IRI({EX}graph{g})" for q in got)
