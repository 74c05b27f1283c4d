"""Columnar fast-path decoder ≡ general decoder + statements_to_table.

The general decoder is pinned against the reference parser
(tests/test_jelly_interop.py), so table equality here extends that chain to
the fast path.  Fallback contract: quads / GRAPHS / RDF-star / generalized
streams return None.
"""

from __future__ import annotations

import pyarrow as pa
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
from pyjelly_ray.jelly.decode_fast import decode_table
from pyjelly_ray.sources.jelly_source import statements_to_table

EX = "http://example.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def adversarial_triples(n=4000, n_iris=700):
    """Tiny-lookup stress: evictions, delta ids, repeats, mixed literals."""
    import random

    rng = random.Random(11)
    stmts = []
    for i in range(n):
        s = T.iri(f"{EX}ns{rng.randrange(9)}/s{rng.randrange(n_iris)}")
        p = T.iri(f"{EX}ont#p{rng.randrange(40)}")
        r = rng.random()
        if r < 0.3:
            o = T.literal(f"v{i}")
        elif r < 0.45:
            o = T.literal(str(i), datatype=XSD_INT)
        elif r < 0.55:
            o = T.literal(f"t{i}", lang=rng.choice(["en", "de", "es"]))
        elif r < 0.65:
            o = T.bnode(f"b{rng.randrange(30)}")
        elif r < 0.7:
            o = T.literal(f"p{i}", datatype=XSD_STRING)
        else:
            o = T.iri(f"{EX}ns{rng.randrange(9)}/o{rng.randrange(n_iris)}")
        stmts.append((s, p, o))
        if rng.random() < 0.2:  # repeated-term runs
            stmts.append(stmts[-1])
    # unsplittable IRIs (empty prefix path)
    stmts.append((T.iri("urn:x:1"), T.iri("tag:p"), T.iri("urn:x:2")))
    return stmts


@pytest.mark.parametrize(
    "preset,frame_size",
    [
        (LookupPreset(), 250),
        (LookupPreset.small(), 1),
        (LookupPreset.tiny(), 4),
        (LookupPreset.no_prefixes(), 200),
    ],
)
def test_fast_decode_matches_general(preset, frame_size):
    stmts = adversarial_triples()
    opts = StreamOptions(lookup_preset=preset, frame_size=frame_size)
    data = b"".join(encode_flat(iter(stmts), opts))
    fast = decode_table(data)
    assert fast is not None
    general = statements_to_table(decode_flat(data))
    assert fast.equals(general)


def test_fast_decode_with_namespace_rows():
    """Namespace declarations mutate lookup delta state — must stay in sync."""
    from pyjelly_ray.jelly.encode import StreamEncoder

    opts = StreamOptions(namespace_declarations=True, frame_size=7)
    enc = StreamEncoder(opts)
    out = bytearray()
    chunk = enc.namespace_declaration("ex", EX + "ns0/")
    if chunk:
        out += chunk
    for s, p, o in adversarial_triples(500):
        chunk = enc.triple(s, p, o)
        if chunk:
            out += chunk
    tail = enc.flush()
    if tail:
        out += tail
    data = bytes(out)
    fast = decode_table(data)
    assert fast is not None
    general = statements_to_table(decode_flat(data))
    assert fast.equals(general)


def adversarial_quads(n=2000):
    """Quad variant: graph slot cycles iris/bnodes/default + repeats."""
    import random

    rng = random.Random(23)
    out = []
    for s, p, o in adversarial_triples(n):
        r = rng.random()
        if r < 0.3:
            g = T.iri(f"{EX}graph/{rng.randrange(12)}")
        elif r < 0.4:
            g = T.bnode(f"gb{rng.randrange(5)}")
        elif r < 0.55:
            g = T.DEFAULT_GRAPH
        else:
            g = out[-1][3] if out else T.DEFAULT_GRAPH  # repeated graph term
        out.append((s, p, o, g))
    return out


@pytest.mark.parametrize(
    "preset,frame_size",
    [
        (LookupPreset(), 250),
        (LookupPreset.tiny(), 4),
    ],
)
def test_fast_decode_quads_matches_general(preset, frame_size):
    opts = StreamOptions(
        lookup_preset=preset,
        frame_size=frame_size,
        physical_type=PHYSICAL_QUADS,
        logical_type=LOGICAL_FLAT_QUADS,
    )
    data = b"".join(encode_flat(iter(adversarial_quads()), opts))
    fast = decode_table(data)
    assert fast is not None
    assert "g_kind" in fast.column_names
    general = statements_to_table(decode_flat(data))
    assert fast.equals(general)


def test_fast_decode_declines_non_triples():
    star = [
        (
            T.quoted(T.iri(EX + "a"), T.iri(EX + "b"), T.literal("c")),
            T.iri(EX + "p"),
            T.literal("y"),
        )
    ]
    data = b"".join(encode_flat(iter(star), StreamOptions(rdf_star=True)))
    assert decode_table(data) is None


def test_fast_decode_graphs_matches_general():
    """Physical GRAPHS: fast path flattens to quads exactly like
    decode_flat + statements_to_table, across graph kinds and frames."""
    import random

    from pyjelly_ray.jelly import LOGICAL_DATASETS, PHYSICAL_GRAPHS
    from pyjelly_ray.jelly.encode import StreamEncoder

    rng = random.Random(31)
    opts = StreamOptions(
        physical_type=PHYSICAL_GRAPHS,
        logical_type=LOGICAL_DATASETS,
        lookup_preset=LookupPreset.tiny(),
        frame_size=5,
    )
    enc = StreamEncoder(opts)
    chunks = []
    triples = adversarial_triples(600)
    i = 0
    while i < len(triples):
        r = rng.random()
        if r < 0.4:
            g = T.iri(f"{EX}graph/{rng.randrange(7)}")
        elif r < 0.6:
            g = T.bnode(f"gb{rng.randrange(3)}")
        else:
            g = T.DEFAULT_GRAPH
        out = enc.graph_start(g)
        if out:
            chunks.append(out)
        for _ in range(rng.randrange(1, 6)):
            if i >= len(triples):
                break
            s, p, o = triples[i]
            i += 1
            out = enc.triple(s, p, o)
            if out:
                chunks.append(out)
        out = enc.graph_end()
        if out:
            chunks.append(out)
    tail = enc.flush()
    if tail:
        chunks.append(tail)
    data = b"".join(chunks)
    fast = decode_table(data)
    assert fast is not None
    assert "g_kind" in fast.column_names
    general = statements_to_table(decode_flat(data))
    assert fast.equals(general)


def test_cfold_dec_available_and_matches_python_fold():
    """The compiled decode fold must be active on this host and table-equal
    to the pure-Python fold on the adversarial grid (the other tests pin
    whichever fold is active against the GENERAL decoder; this one pins
    C-vs-Python explicitly so a cfold_dec regression can't hide behind the
    fallback)."""
    from pyjelly_ray.jelly import cfold_dec
    from pyjelly_ray.jelly.encode import encode_flat

    assert cfold_dec.LIB is not None, "gcc present but compiled decode fold unavailable"
    saved = cfold_dec.LIB
    try:
        for preset, frame_size in (
            (LookupPreset(), 250),
            (LookupPreset.small(), 1),
            (LookupPreset.tiny(), 4),
            (LookupPreset.no_prefixes(), 200),
        ):
            opts = StreamOptions(lookup_preset=preset, frame_size=frame_size)
            data = b"".join(encode_flat(adversarial_triples(), opts))
            cfold_dec.LIB = saved
            out_c = decode_table(data)
            cfold_dec.LIB = None
            out_py = decode_table(data)
            assert out_c is not None and out_py is not None
            assert out_c.equals(out_py), (preset, frame_size)
    finally:
        cfold_dec.LIB = saved


def test_cfold_dec_long_payloads_and_errors():
    """C decode edge cases: >16KB lexemes, long names, and the fallback on
    truncated input (the Python fold must still raise)."""
    from pyjelly_ray.jelly import cfold_dec
    from pyjelly_ray.jelly.encode import encode_flat

    assert cfold_dec.LIB is not None
    long_iri = "https://ex.org/" + "y" * 400 + "#n"
    stmts = [
        (T.iri(long_iri), T.iri("tag:p"), T.literal("L" * 20_000)),
        (T.iri(long_iri), T.iri("tag:p"), T.bnode("b" * 300)),
    ] * 4
    data = b"".join(encode_flat(stmts, StreamOptions()))
    out = decode_table(data)
    general = statements_to_table(decode_flat(data))
    assert out.equals(general)
    # invalid UTF-8 inside a lexeme: C path must reject at validation and
    # defer to the Python fold (which raises UnicodeDecodeError)
    bad = data.replace(b"L" * 16, b"\xff" * 16, 1)
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_table(bad)


def test_cfold_dec_graphs_matches_python_and_general():
    """GRAPHS physical through the C decode fold across presets/frames/
    seeds: C == Python fold == general decoder (graph markers, default
    graphs, bnode graph names, frame cuts splitting graphs)."""
    import random

    from pyjelly_ray.jelly import LOGICAL_DATASETS, PHYSICAL_GRAPHS
    from pyjelly_ray.jelly import cfold_dec
    from pyjelly_ray.jelly.encode import StreamEncoder

    assert cfold_dec.LIB is not None
    saved = cfold_dec.LIB
    try:
        for seed, preset, fs in (
            (1, LookupPreset(), 250),
            (2, LookupPreset.tiny(), 3),
            (3, LookupPreset.small(), 1),
            (4, LookupPreset.no_prefixes(), 7),
        ):
            rng = random.Random(seed)
            opts = StreamOptions(
                physical_type=PHYSICAL_GRAPHS,
                logical_type=LOGICAL_DATASETS,
                lookup_preset=preset,
                frame_size=fs,
            )
            enc = StreamEncoder(opts)
            chunks = []
            triples = adversarial_triples(400)
            i = 0
            while i < len(triples):
                r = rng.random()
                if r < 0.4:
                    g = T.iri(f"{EX}graph/{rng.randrange(7)}")
                elif r < 0.6:
                    g = T.bnode(f"gb{rng.randrange(3)}")
                else:
                    g = T.DEFAULT_GRAPH
                out = enc.graph_start(g)
                if out:
                    chunks.append(out)
                for _ in range(rng.randrange(1, 6)):
                    if i >= len(triples):
                        break
                    s, p, o = triples[i]
                    i += 1
                    out = enc.triple(s, p, o)
                    if out:
                        chunks.append(out)
                out = enc.graph_end()
                if out:
                    chunks.append(out)
            tail = enc.flush()
            if tail:
                chunks.append(tail)
            data = b"".join(chunks)
            cfold_dec.LIB = saved
            out_c = decode_table(data)
            cfold_dec.LIB = None
            out_py = decode_table(data)
            general = statements_to_table(decode_flat(data))
            assert out_c is not None and out_c.equals(out_py), (seed, fs)
            assert out_c.equals(general), (seed, fs)
    finally:
        cfold_dec.LIB = saved


def test_cfold_dec_skips_frame_metadata():
    """Frame-level metadata (field 15) must be skipped identically by the C
    fold, the Python fold and the general decoder."""
    from pyjelly_ray.jelly import cfold_dec
    from pyjelly_ray.jelly.encode import StreamEncoder

    opts = StreamOptions(frame_size=5)
    enc = StreamEncoder(opts)
    enc.metadata_fn = lambda i: {"idx": str(i).encode(), "k": b"\x01\x02"}
    chunks = []
    for s, p, o in adversarial_triples(100):
        out = enc.triple(s, p, o)
        if out:
            chunks.append(out)
    tail = enc.flush()
    if tail:
        chunks.append(tail)
    data = b"".join(chunks)
    general = statements_to_table(decode_flat(data))
    saved = cfold_dec.LIB
    try:
        out_c = decode_table(data)
        cfold_dec.LIB = None
        out_py = decode_table(data)
    finally:
        cfold_dec.LIB = saved
    assert out_c.equals(general) and out_py.equals(general)


def test_cfold_dec_corruption_fuzz_never_crashes():
    """Seeded byte-corruption fuzz: malformed streams must either decode
    (payload-only damage) or raise a Python exception via the fallback —
    never segfault/overread (the C fold bounds-checks every span)."""
    import random

    from pyjelly_ray.jelly.encode import encode_flat

    data = b"".join(
        encode_flat(adversarial_triples(300), StreamOptions(frame_size=17))
    )
    rng = random.Random(7)
    outcomes = {"ok": 0, "err": 0}
    for _ in range(400):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_table(bytes(b))
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 400


def test_encode_grouped_graphs_emits_marker_rows():
    """PHYSICAL_GRAPHS via encode_grouped must produce graph_start/triple/
    graph_end marker rows (NOT quad rows — nonconformant in this physical
    type); frames cut per group; 3-tuples land in the default graph."""
    from pyjelly_ray.jelly import parse_options
    from pyjelly_ray.jelly.encode import encode_grouped
    from pyjelly_ray.jelly.options import (
        LOGICAL_NAMED_GRAPHS,
        PHYSICAL_GRAPHS,
    )

    g1, g2 = T.iri(f"{EX}g/1"), T.bnode("gb")
    grp = [
        [(T.iri(f"{EX}s"), T.iri(f"{EX}p"), T.iri(f"{EX}o"), g1),
         (T.iri(f"{EX}s"), T.iri(f"{EX}p"), T.literal("x"), g1)],
        [(T.iri(f"{EX}s2"), T.iri(f"{EX}p"), T.iri(f"{EX}o"), g2),
         (T.iri(f"{EX}s2"), T.iri(f"{EX}p"), T.iri(f"{EX}o2"))],
    ]
    opts = StreamOptions(
        physical_type=PHYSICAL_GRAPHS, logical_type=LOGICAL_NAMED_GRAPHS
    )
    data = b"".join(encode_grouped(grp, opts))
    _, spans = parse_options(data)
    assert len(spans) == 2  # one frame per group
    got = list(decode_flat(data))
    assert [q[3][0] for q in got] == [1, 1, 2, 4]  # iri, iri, bnode, DEFAULT
    fast = decode_table(data)
    general = statements_to_table(got)
    assert fast is not None and fast.equals(general)
